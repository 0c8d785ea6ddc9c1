"""Test harness: force an 8-virtual-device CPU platform.

Multi-chip logic (mesh, psum, per-host PRNG, padded gather) is exercised
on 8 fake CPU devices — the JAX-native way to test pod code without a
pod. The axon TPU plugin in this image imports jax at interpreter startup
(sitecustomize), freezing ``jax_platforms=axon`` before env vars can act,
so the override must go through jax.config + a backend reset.

Set PSO_TEST_TPU=1 to run the suite on the real chip instead.
"""

import os

if not os.environ.get("PSO_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    from jax._src import xla_bridge

    jax.config.update("jax_platforms", "cpu")
    xla_bridge._clear_backends()
    assert jax.devices()[0].platform == "cpu", jax.devices()
else:
    import jax  # noqa: F401

jax.config.update("jax_enable_x64", False)
