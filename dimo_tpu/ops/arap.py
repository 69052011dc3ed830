"""As-rigid-as-possible regularization over deformed control-point graphs.

TPU-native port of the reference's ARAP machinery (`utils/deform_utils.py`):
  * connectivity_shared: edges valid in ALL sampled frames via ball query
    (v2 semantics, `cal_connectivity_from_points_v2:115-141`);
  * best-fit per-node rotations by weighted Procrustes with det-flip fix
    (`estimate_rotation:161-197`), computed under stop_gradient exactly like
    the reference's torch.no_grad;
  * energy = sum_t sum_edges w * ||e_t - R e_0||^2 (`cal_arap_error:208-236`).

Everything is masked fixed-shape jnp: edges are (N, K) index+mask arrays, the
batched 3x3 SVD runs via jnp.linalg.svd.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from dimo_tpu.ops.neighbors import pairwise_sq_dists


def connectivity_shared(points_t: jnp.ndarray, k: int = 10, radius: float = 0.1,
                        valid: jnp.ndarray | None = None):
    """Neighbors within `radius` in every frame (dense small-N path).

    Args:
      points_t: (T, N, 3) node positions over T sampled times.
      valid: optional (N,) node mask.
    Returns:
      idx (N, k) int32 (arbitrary fill where invalid), mask (N, k) bool.
    """
    t, n, _ = points_t.shape
    d2 = jax.vmap(lambda p: pairwise_sq_dists(p, p))(points_t)   # (T, N, N)
    inside = jnp.all(d2 < radius * radius, axis=0)               # (N, N)
    inside = inside & ~jnp.eye(n, dtype=bool)
    if valid is not None:
        inside = inside & valid[:, None] & valid[None, :]
    # nearest-first among qualifying, using frame-0 distances
    score = jnp.where(inside, d2[0], jnp.inf)
    neg, idx = lax.top_k(-score, k)
    mask = jnp.isfinite(-neg)
    return idx, mask


def connectivity_sampled(points_t: jnp.ndarray, sel: jnp.ndarray,
                         k: int = 10, radius: float = 0.1,
                         valid: jnp.ndarray | None = None,
                         candidates: int = 24):
    """Shared-edge connectivity for a SUBSET of source nodes, O(S*N + T*S*Kc).

    Same semantics as connectivity_shared restricted to rows `sel`, except
    the "within radius in every frame" test is evaluated only on the Kc
    nearest frame-0 candidates (a gaussian that is outside the candidate set
    at frame 0 is essentially never a shared-radius neighbor; the reference's
    per-frame ball_query caps at K=11 candidates per frame anyway,
    `utils/deform_utils.py:123`). Avoids the (T, N, N) blow-up.

    Args:
      points_t: (T, N, 3); sel: (S,) int32 sampled node rows.
      valid: optional (N,) node mask.
    Returns:
      idx (S, k) int32 neighbor rows into N, mask (S, k) bool.
    """
    t, n, _ = points_t.shape
    kc = min(candidates, n)
    p0 = points_t[0]
    d2_0 = pairwise_sq_dists(p0[sel], p0)                        # (S, N)
    col = jnp.arange(n, dtype=jnp.int32)[None, :]
    bad = col == sel[:, None]                                    # self-edges
    if valid is not None:
        bad = bad | ~valid[None, :]
    score0 = jnp.where(bad, jnp.inf, d2_0)
    neg0, cand = lax.top_k(-score0, kc)                          # (S, Kc)
    cand_d0 = -neg0

    # per-frame verification on candidates only: (T, S, Kc)
    src_t = points_t[:, sel]                                     # (T, S, 3)
    cand_t = points_t[:, cand.reshape(-1)].reshape(t, *cand.shape, 3)
    d2_t = jnp.sum((src_t[:, :, None, :] - cand_t) ** 2, axis=-1)
    inside_all = jnp.all(d2_t < radius * radius, axis=0)         # (S, Kc)
    inside_all = inside_all & jnp.isfinite(cand_d0)

    score = jnp.where(inside_all, cand_d0, jnp.inf)
    neg, pick = lax.top_k(-score, k)                             # (S, k)
    idx = jnp.take_along_axis(cand, pick, axis=1)
    mask = jnp.isfinite(-neg)
    return idx, mask


def _edge_matrix(points: jnp.ndarray, idx: jnp.ndarray,
                 mask: jnp.ndarray) -> jnp.ndarray:
    """E[i, n] = p_i - p_idx[i,n], zeroed where mask is False. (N, K, 3)."""
    e = points[:, None, :] - points[idx]
    return jnp.where(mask[..., None], e, 0.0)


def _procrustes(e0: jnp.ndarray, et: jnp.ndarray, w: jnp.ndarray,
                iters: int = 30) -> jnp.ndarray:
    """Per-node best-fit ROTATION R minimizing sum_k w ||et - R e0||^2.

    e0, et: (N, K, 3); w: (N, K). Computed under stop_gradient.

    Instead of batched SVD (jnp.linalg.svd lowers to an iterative algorithm
    that costs ~20s/step on TPU at this batch size), uses Horn's quaternion
    formulation: the optimal rotation is the top eigenvector of a symmetric
    4x4 built from the cross-covariance, found by shifted power iteration —
    pure batched (N,4,4)@(N,4) matmuls. det(R)=+1 by construction (the SVD
    det-flip fix is unnecessary), and S=0 (undeformed nodes, the reference's
    guard at `utils/deform_utils.py:178-180`) yields identity.
    """
    e0 = lax.stop_gradient(e0)
    et = lax.stop_gradient(et)
    S = jnp.einsum("nki,nk,nkj->nij", e0, w, et)                 # (N, 3, 3)

    sxx, sxy, sxz = S[:, 0, 0], S[:, 0, 1], S[:, 0, 2]
    syx, syy, syz = S[:, 1, 0], S[:, 1, 1], S[:, 1, 2]
    szx, szy, szz = S[:, 2, 0], S[:, 2, 1], S[:, 2, 2]
    row0 = jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx], -1)
    row1 = jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz], -1)
    row2 = jnp.stack([szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy], -1)
    row3 = jnp.stack([sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz], -1)
    Nmat = jnp.stack([row0, row1, row2, row3], axis=-2)          # (N, 4, 4)

    # shift so the top eigenvalue is dominant and positive
    shift = 2.0 * jnp.sqrt(jnp.sum(S * S, axis=(1, 2)))[:, None, None] + 1e-6
    M = Nmat + shift * jnp.eye(4)[None]

    q = jnp.zeros((S.shape[0], 4)).at[:, 0].set(1.0)             # identity init
    def body(_, qv):
        qv = jnp.einsum("nij,nj->ni", M, qv)
        return qv / jnp.linalg.norm(qv, axis=-1, keepdims=True).clip(1e-20)
    q = lax.fori_loop(0, iters, body, q)

    return quat_to_matrix(q)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    from dimo_tpu.ops import quat as quat_ops
    return quat_ops.to_matrix(q)


def arap_error(points_t: jnp.ndarray, idx: jnp.ndarray, mask: jnp.ndarray,
               weight: jnp.ndarray | None = None,
               sel: jnp.ndarray | None = None) -> jnp.ndarray:
    """ARAP energy of a trajectory (T, N, 3) w.r.t. frame 0.

    sel: optional (S,) source-node rows matching idx/mask rows (the
    reference's sample_idx, `utils/deform_utils.py:219-224`); None = rows
    align with points_t's node axis.
    """
    w = mask.astype(points_t.dtype) if weight is None else weight

    def edges(pt):
        src = pt if sel is None else pt[sel]
        e = src[:, None, :] - pt[idx]
        return jnp.where(mask[..., None], e, 0.0)

    e0 = edges(points_t[0])

    def per_frame(pt):
        et = edges(pt)
        R = _procrustes(e0, et, w)
        rigid = jnp.einsum("nij,nkj->nki", R, e0)
        stretch = et - rigid
        return jnp.sum(w * jnp.sum(stretch * stretch, axis=-1))

    errs = jax.vmap(per_frame)(points_t[1:])
    return jnp.sum(errs)


def arap_loss(base_pts: jnp.ndarray, d_xyz_t: jnp.ndarray,
              valid: jnp.ndarray | None = None, k: int = 10,
              radius: float = 0.1, sample_num: int = 512,
              rng: jax.Array | None = None) -> jnp.ndarray:
    """Reference arap_loss_v2 (`latent_gs_renderer.py:1081-1094`): trajectory
    = stop_grad(base) + deformation(t); shared-edge graph; energy vs frame 0,
    with the Procrustes/energy restricted to `sample_num` random nodes when
    the graph is larger (reference cal_arap_error sampling with replacement,
    `utils/deform_utils.py:219-224`). Peak memory is O(S*N), never (T,N,N).

    base_pts: (N, 3); d_xyz_t: (T, N, 3) TimeNet translations at T times.
    rng: sampling key; required when N > sample_num (matches the reference's
    fresh np.random.choice each call).
    """
    pts_t = lax.stop_gradient(base_pts)[None] + d_xyz_t
    pts_ng = lax.stop_gradient(pts_t)
    n = base_pts.shape[0]
    if n > sample_num:
        if rng is None:
            raise ValueError("arap_loss: rng required when N > sample_num")
        if valid is not None:
            p = valid.astype(jnp.float32)
            p = p / jnp.maximum(jnp.sum(p), 1.0)
            sel = jax.random.choice(rng, n, (sample_num,), replace=True, p=p)
        else:
            sel = jax.random.choice(rng, n, (sample_num,), replace=True)
        sel = sel.astype(jnp.int32)
        idx, mask = connectivity_sampled(pts_ng, sel, k=k, radius=radius,
                                         valid=valid)
        return arap_error(pts_t, idx, mask, sel=sel)
    idx, mask = connectivity_shared(pts_ng, k=k, radius=radius, valid=valid)
    return arap_error(pts_t, idx, mask)
