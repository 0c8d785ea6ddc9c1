"""Online PSO on SDXL-Turbo (entry-point parity with the reference
``train_online_pso_sdxl_turbo.py``).

Usage:
  python -m pairwise_sample_optimization_tpu.cli.train_online_pso_sdxl_turbo \
      --config=pairwise_sample_optimization_tpu/configs/sdxl_turbo_dpo.py \
      --config.train.beta=50 --config.sample.num_steps=4
"""

from absl import app
from ml_collections import config_flags

from .online_runner import run_online_pso

_CONFIG = config_flags.DEFINE_config_file(
    "config",
    default="pairwise_sample_optimization_tpu/configs/sdxl_turbo_dpo.py",
)


def main(_):
    config = _CONFIG.value
    assert config.train.distilled_train_steps == config.sample.num_steps - 1, (
        "turbo trains the num_steps-1 stochastic transitions"
    )
    if not config.run_name:
        eff_bs = config.train.gradient_accumulation_steps * config.train.batch_size
        spe = config.sample.num_batches_per_epoch * config.sample.batch_size
        config.run_name = (
            f"SDXL_Turbo{config.sample.num_steps}_PS"
            f"_{spe}sample_perhost_lorarank{config.train.lora_rank}"
            f"_lr{config.train.learning_rate}_beta{config.train.beta}"
            f"_bs{eff_bs}"
        )
    run_online_pso(config, sampler="turbo")


if __name__ == "__main__":
    app.run(main)
