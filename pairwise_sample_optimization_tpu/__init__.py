"""Pairwise Sample Optimization (PSO), TPU-native.

A from-scratch JAX/XLA/Pallas re-implementation of the capabilities of the
reference repo ``yaramohamadi/Pairwise_Sample_Optimization`` (PSO: "Tuning
Timestep-Distilled Diffusion Model Using Pairwise Sample Optimization",
arXiv 2410.03190), designed TPU-first:

- few-step distilled samplers (SDXL-Turbo Euler-ancestral, SDXL-DMD2 DDPM
  re-noise) as pure, batched, ``lax.scan``-able step/logprob kernels;
- SDXL UNet / VAE / CLIP text+vision towers in Flax (NHWC, bf16, Pallas
  flash-attention + fused GroupNorm/SiLU);
- reward scorers (PickScore, CLIP score, aesthetic, HPSv2) as jitted
  on-device programs — no PIL round trips;
- the full online PSO loop (sample pairs -> reward -> rank -> DPO-style
  update of LoRA vs. frozen reference) compiled as pjit programs over a
  ``jax.sharding.Mesh`` with a ``data`` axis for pod scaling;
- offline / DreamBooth PSO personalization;
- orbax checkpointing + diffusers-layout LoRA safetensors interop.

Reference parity map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
