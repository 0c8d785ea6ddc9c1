"""Test harness: force an 8-virtual-device CPU platform.

Multi-chip logic (mesh, psum, per-host PRNG, padded gather) is exercised on
8 fake CPU devices — the JAX-native way to test pod code without a pod.
Must run before jax initializes, hence module-level in conftest.
"""

import os

# force CPU even when the shell exports JAX_PLATFORMS=axon (the TPU tunnel);
# set PSO_TEST_TPU=1 to run the suite on the real chip instead.
if not os.environ.get("PSO_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
