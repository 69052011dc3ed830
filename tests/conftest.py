"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip sharding tests need >1 device; no TPU pod is available in CI, so
we force the CPU backend with 8 host devices (Pallas kernels then run in
interpreter mode). The environment's sitecustomize imports jax at interpreter
boot, so env vars alone are too late — use jax.config, which takes effect as
long as no backend has been initialized yet.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
