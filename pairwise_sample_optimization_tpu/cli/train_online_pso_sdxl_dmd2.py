"""Online PSO on SDXL-DMD2 (entry-point parity with the reference
``train_online_pso_sdxl_dmd2.py``): 1024^2, fixed distillation lattice,
DDPM re-noise transitions, strict-dominance preference."""

from absl import app
from ml_collections import config_flags

from .online_runner import run_online_pso

_CONFIG = config_flags.DEFINE_config_file(
    "config",
    default="pairwise_sample_optimization_tpu/configs/sdxl_dmd_dpo.py",
)


def main(_):
    config = _CONFIG.value
    assert config.train.distilled_train_steps == config.sample.num_steps - 1
    if not config.run_name:
        config.run_name = (
            f"SDXL_DMD{config.sample.num_steps}_PS"
            f"_lorarank{config.train.lora_rank}_lr{config.train.learning_rate}"
            f"_beta{config.train.beta}"
        )
    run_online_pso(config, sampler="dmd")


if __name__ == "__main__":
    app.run(main)
