"""Point sampling for mask losses (PointRend-style).

Capability parity with modeling/modules/point_features.py:21-121
(``point_sample`` bilinear sampling at normalized coords,
``get_uncertain_point_coords_with_randomness`` importance sampling) —
implemented with vectorized JAX gathers (static shapes; the oversample /
top-k selection pattern maps directly to ``jax.lax.top_k``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def point_sample(features: jax.Array, coords: jax.Array, align_corners: bool = False):
    """Bilinear-sample ``features`` [C, H, W] at ``coords`` [P, 2] in [0, 1]
    (x, y) — grid_sample semantics.  Returns [C, P].

    TPU layout note: the four corner lookups gather ROWS of the [H·W, C]
    transpose (one contiguous C-vector per point) instead of
    ``features[:, yy, xx]`` — the per-element two-index gather that form
    lowers to reads C strided cache lines per point and dominated the seg
    train step (12544 points × 201 masks × 4 corners × 10 layers)."""
    C, H, W = features.shape
    x = coords[:, 0] * W - 0.5 if not align_corners else coords[:, 0] * (W - 1)
    y = coords[:, 1] * H - 0.5 if not align_corners else coords[:, 1] * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    feats_t = features.reshape(C, H * W).T      # [H·W, C]: row per pixel

    def gather(yy, xx):
        yy_c = jnp.clip(yy.astype(jnp.int32), 0, H - 1)
        xx_c = jnp.clip(xx.astype(jnp.int32), 0, W - 1)
        valid = ((yy >= 0) & (yy <= H - 1) & (xx >= 0) & (xx <= W - 1))
        vals = jnp.take(feats_t, yy_c * W + xx_c, axis=0)   # [P, C]
        return jnp.where(valid[:, None], vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx)[:, None] + v01 * wx[:, None]
    bot = v10 * (1 - wx)[:, None] + v11 * wx[:, None]
    return (top * (1 - wy)[:, None] + bot * wy[:, None]).T


def point_sample_matmul(features: jax.Array, coords: jax.Array,
                        align_corners: bool = False):
    """Bilinear sampling as two tent-weight matmuls — numerically the same
    map as ``point_sample`` (zero-padded grid_sample), but it runs on the
    MXU instead of per-point gathers.

    The bilinear weight of grid row h for a query at continuous row y is
    exactly ``max(0, 1 - |y - h|)`` (edges included: y ∈ [-0.5, 0] leaves
    total weight < 1, reproducing zero padding), so sampling is
    ``A_y [P, H] @ F [H, W]`` followed by a per-point row dot with
    ``A_x [P, W]``.  Gathers at the criterion's scale (12544 points × 201
    masks × 4 corners × 10 supervision layers) made point sampling 85% of
    the seg train step; this form cut the step 5.37 → 0.85 s-class.
    """
    C, H, W = features.shape
    P = coords.shape[0]
    # the [C, P, W] intermediate of the first tent matmul is the criterion's
    # biggest liability (201 queries × 12544 points × W f32 ≈ 1.3 GB per
    # image at 512² — the single largest allocation in the joint-train b8
    # OOM dump): chunk the points through a REMATERIALIZED scan so only one
    # [C, chunk, W] block is ever live (forward and backward).  Padded
    # chunk-fill coords sit far outside the grid → zero tent weight → exact.
    import os

    target = int(os.environ.get("CULLAVO_POINT_CHUNK", 2048))
    if 0 < target < P:
        n = -(-P // target)
        pad = n * target - P
        coords_p = jnp.concatenate(
            [coords, jnp.full((pad, 2), -10.0, coords.dtype)]) if pad else coords

        def do(c):
            return point_sample_matmul(features, c, align_corners=align_corners)

        out = jax.lax.map(jax.checkpoint(do),
                          coords_p.reshape(n, target, 2))     # [n, C, target]
        return out.transpose(1, 0, 2).reshape(C, n * target)[:, :P]
    if align_corners:
        y = coords[:, 1] * (H - 1)
        x = coords[:, 0] * (W - 1)
    else:
        y = coords[:, 1] * H - 0.5
        x = coords[:, 0] * W - 0.5
    ay = jnp.clip(1.0 - jnp.abs(y[:, None] - jnp.arange(H)[None, :]), 0.0, 1.0)
    ax = jnp.clip(1.0 - jnp.abs(x[:, None] - jnp.arange(W)[None, :]), 0.0, 1.0)
    # precision="high" (bf16x3 on TPU ≈ fp32 accuracy): the default bf16
    # matmul pass loses ~1e-2 relative on the tent weights, which shifts
    # sampled mask logits visibly vs the gather/grid_sample reference
    g = jnp.einsum("ph,chw->cpw", ay, features.astype(jnp.float32),
                   precision="high", preferred_element_type=jnp.float32)
    return jnp.einsum("cpw,pw->cp", g, ax, precision="high",
                      preferred_element_type=jnp.float32)


def point_sample_batch(features: jax.Array, coords: jax.Array, **kw):
    """[N, C, H, W], [N, P, 2] → [N, C, P] (matmul formulation)."""
    return jax.vmap(lambda f, c: point_sample_matmul(f, c, **kw))(features, coords)


def calculate_uncertainty(logits: jax.Array) -> jax.Array:
    """-|logit| — highest where the mask prediction is least certain
    (point_features uncertainty for the single-channel mask case)."""
    return -jnp.abs(logits)


def uncertain_point_coords(
    mask_logits: jax.Array,       # [N, 1, H, W]
    rng: jax.Array,
    num_points: int,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> jax.Array:
    """Importance-sample ``num_points`` coords: oversample uniformly, keep the
    top-uncertainty fraction, fill the rest uniformly.  Returns [N, P, 2]."""
    N = mask_logits.shape[0]
    n_sampled = int(num_points * oversample_ratio)
    k1, k2 = jax.random.split(rng)
    coords = jax.random.uniform(k1, (N, n_sampled, 2))
    point_logits = point_sample_batch(mask_logits, coords)          # [N, 1, S]
    uncert = calculate_uncertainty(point_logits)[:, 0, :]           # [N, S]

    n_uncertain = int(importance_sample_ratio * num_points)
    n_random = num_points - n_uncertain
    _, top_idx = jax.lax.top_k(uncert, n_uncertain)
    picked = jnp.take_along_axis(coords, top_idx[..., None], axis=1)
    if n_random > 0:
        rand = jax.random.uniform(k2, (N, n_random, 2))
        picked = jnp.concatenate([picked, rand], axis=1)
    return picked
