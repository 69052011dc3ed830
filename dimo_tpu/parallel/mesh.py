"""Device mesh + sharding helpers for data-parallel render batches.

The reference is strictly single-GPU (SURVEY.md section 2.3); the TPU-native
scaling axis is the per-step render batch: B (motion, view, frame) jobs shard
over devices along a "data" mesh axis, parameters replicate, and XLA inserts
the gradient psum over ICI. Because the train step is already one jitted
function of (replicated state, batched batch), scaling out = annotating
shardings — no step-code changes (the idiomatic pjit recipe).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(f"requested a {n}-device '{axis}' mesh but only "
                         f"{len(devs)} devices are visible")
    return Mesh(np.array(devs[:n]), (axis,))


def make_sp_mesh(n_devices: int | None = None) -> Mesh:
    """Mesh for SPATIAL parallelism of a single render: the rasterizer
    shards its count-balanced strip buffers over the "sp" axis (see
    ops/rasterizer/api.py `sp_mesh`) — the scaling axis for one large
    frame, complementary to the batch "data" axis. Raises when fewer
    devices exist (a silent 1-device mesh would report sharded benchmark
    numbers that actually measured the unsharded path)."""
    return make_mesh(n_devices, axis="sp")


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place every batch leaf with its leading (render-job) axis sharded over
    the "data" mesh axis."""
    def place(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(place, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
