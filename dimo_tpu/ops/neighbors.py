"""Neighbor queries as dense masked top-k — the TPU-native replacement for the
reference's four CUDA neighbor kernels:

  * knn(k)            <- KNN_CUDA `knn_cuda.KNN` (`main_train_dimo.py:502-509`)
  * mean_sq_dist_3nn  <- simple-knn `distCUDA2` (`latent_gs_renderer.py:426`)
  * farthest_point_sampling <- pytorch3d `sample_farthest_points`
                               (`main_train_dimo.py:511-515`)
  * ball_query        <- pytorch3d `ops.ball_query` (`utils/deform_utils.py:123`)
  * chamfer           <- chamferdist forward chamfer (`main_train_dimo.py:298-300`)

Design note: on TPU the point counts here (<= ~100k queries x <= 512 refs) make
an explicit (tiled) distance matrix + `jax.lax.top_k` far faster than any
spatial data structure — the MXU computes the Gram matrix, the VPU does the
top-k. Everything is jit-safe with static shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_sq_dists(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances (N, D) x (M, D) -> (N, M).

    Uses the |x|^2 - 2xy + |y|^2 expansion so the cross term rides the MXU.
    """
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)           # (N, 1)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True).T          # (1, M)
    xy = x @ y.T                                           # (N, M) on MXU
    return jnp.maximum(x2 - 2.0 * xy + y2, 0.0)


def knn(queries: jnp.ndarray, refs: jnp.ndarray, k: int):
    """k nearest refs for each query.

    Args:
      queries: (N, 3), refs: (M, 3), k static.
    Returns:
      dists: (N, k) euclidean distances (NOT squared — matches KNN_CUDA
        transpose_mode output consumed at `main_train_dimo.py:506-509`),
      idx: (N, k) int32 indices into refs, ascending by distance.
    """
    d2 = pairwise_sq_dists(queries, refs)
    if k <= 8:
        # iterated argmin: k passes of (min, argmin, mask) over (N, M) beat
        # lax.top_k by ~8x on TPU for small k (29 -> 3.7 ms at 100k x 512;
        # top_k lowers to a full sort along the axis)
        col = jnp.arange(refs.shape[0], dtype=jnp.int32)[None]
        ds, ids = [], []
        d2i = d2
        for _ in range(k):
            i = jnp.argmin(d2i, axis=1).astype(jnp.int32)
            ds.append(jnp.min(d2i, axis=1))
            ids.append(i)
            d2i = jnp.where(col == i[:, None], jnp.inf, d2i)
        return (jnp.sqrt(jnp.maximum(jnp.stack(ds, 1), 0.0)),
                jnp.stack(ids, 1))
    neg, idx = jax.lax.top_k(-d2, k)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx


def knn_self(points: jnp.ndarray, k: int):
    """k nearest neighbors of each point among the others (self excluded).

    Returns squared dists (N, k) and indices (N, k) — matches the
    `pytorch3d.ops.knn_points(..., K=k+1)[:, 1:]` pattern used by the ARAP
    connectivity builder (`utils/deform_utils.py:76-78`).
    """
    d2 = pairwise_sq_dists(points, points)
    n = points.shape[0]
    d2 = d2 + jnp.eye(n, dtype=d2.dtype) * jnp.inf
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx


def mean_sq_dist_3nn(points: jnp.ndarray, chunk: int = 4096) -> jnp.ndarray:
    """Mean squared distance of each point to its 3 nearest neighbors.

    distCUDA2 equivalent; used once at init to size Gaussian scales
    (`latent_gs_renderer.py:426-427`). Tiled over queries so 100k+ points fit
    comfortably in HBM (full matrix would be N^2 floats).
    """
    n = points.shape[0]
    pad = (-n) % chunk
    padded = jnp.concatenate([points, jnp.full((pad, 3), 1e10, points.dtype)], axis=0)
    nchunks = padded.shape[0] // chunk

    def body(i, out):
        q = jax.lax.dynamic_slice_in_dim(padded, i * chunk, chunk, axis=0)
        d2 = pairwise_sq_dists(q, points)
        # mask self-distance: a query's own row appears once with d2==0
        base = i * chunk
        rows = base + jax.lax.broadcasted_iota(jnp.int32, (chunk, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, n), 1)
        d2 = jnp.where(rows == cols, jnp.inf, d2)
        neg3, _ = jax.lax.top_k(-d2, 3)
        m = jnp.mean(-neg3, axis=-1)
        return jax.lax.dynamic_update_slice_in_dim(out, m, base, axis=0)

    out = jnp.zeros((padded.shape[0],), points.dtype)
    out = jax.lax.fori_loop(0, nchunks, body, out)
    return out[:n]


@functools.partial(jax.jit, static_argnames=("k",))
def farthest_point_sampling(points: jnp.ndarray, k: int,
                            valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Iterative farthest point sampling -> (k,) int32 indices.

    pytorch3d `sample_farthest_points` equivalent (FPS anneal of control
    points, `main_train_dimo.py:511-515`). Starts from index 0 of the valid
    set; `valid` masks out padded slots.
    """
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    big = jnp.inf
    start = jnp.argmax(valid)  # first valid point

    def body(i, carry):
        min_d2, idxs = carry
        last = idxs[i - 1]
        d2 = jnp.sum((points - points[last]) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        cand = jnp.where(valid, min_d2, -big)
        nxt = jnp.argmax(cand)
        idxs = idxs.at[i].set(nxt)
        return min_d2, idxs

    idxs0 = jnp.zeros((k,), jnp.int32).at[0].set(start.astype(jnp.int32))
    _, idxs = jax.lax.fori_loop(1, k, body, (jnp.full((n,), big), idxs0))
    return idxs


def ball_query(queries: jnp.ndarray, refs: jnp.ndarray, k: int, radius: float,
               exclude_self: bool = False):
    """Up to k refs within `radius` of each query (nearest-first).

    Returns (sq_dists (N,k), idx (N,k) with -1 padding) — semantics of
    pytorch3d ball_query as consumed by `utils/deform_utils.py:123`.
    """
    d2 = pairwise_sq_dists(queries, refs)
    if exclude_self:
        n = queries.shape[0]
        d2 = d2 + jnp.eye(n, dtype=d2.dtype) * jnp.inf
    inside = d2 < radius * radius
    masked = jnp.where(inside, d2, jnp.inf)
    neg, idx = jax.lax.top_k(-masked, k)
    dists = -neg
    ok = jnp.isfinite(dists)
    return jnp.where(ok, dists, 0.0), jnp.where(ok, idx, -1)


def chamfer_forward(x: jnp.ndarray, y: jnp.ndarray,
                    x_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Forward chamfer: sum over x of squared distance to nearest y.

    chamferdist `ChamferDistance()(x[None], y[None])` equivalent
    (guidance loss, `main_train_dimo.py:298-300`; reduction = sum).
    """
    d2 = pairwise_sq_dists(x, y)
    nearest = jnp.min(d2, axis=-1)
    if x_valid is not None:
        nearest = jnp.where(x_valid, nearest, 0.0)
    return jnp.sum(nearest)
