"""DIMO-TPU: a TPU-native framework for diverse 3D motion generation.

A ground-up JAX/XLA/Pallas re-design of the capabilities of DIMO
("Diverse 3D Motion Generation for Arbitrary Objects", ICCV 2025;
reference implementation: single-GPU PyTorch + CUDA extensions).

Layers (bottom-up):
  ops/       pure-jnp + Pallas compute kernels (rasterizer, neighbors, losses)
  models/    functional model pytrees (Gaussians, TimeNet, LBS deformation)
  parallel/  device-mesh sharding of batched render jobs
  train/     optimizer, jitted train step, densify/prune control
  io/        PLY + checkpoint + dataset + config
  utils/     cameras, schedules, misc
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: TPU compiles of the fused train step run
# minutes via the remote compiler; caching them makes every subsequent
# process start warm. Override location with DIMO_TPU_COMPILE_CACHE.
import os as _os

try:  # pragma: no cover - environment dependent
    import jax as _jax

    _cache = _os.environ.get("DIMO_TPU_COMPILE_CACHE", "/tmp/dimo_jax_cache")
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # TPU matmuls/convs default to bf16: the SSIM variance estimates
    # (blur(x^2) - mu^2) cancel below bf16 error and the metric explodes
    # past 1 with sign-flipped denominators, poisoning training. Photometric
    # losses need f32; opt into bf16 per-op where it's safe instead.
    _jax.config.update("jax_default_matmul_precision", "float32")
except Exception:
    pass
