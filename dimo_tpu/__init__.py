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
