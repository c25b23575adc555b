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
    (x, y) — grid_sample semantics.  Returns [C, P]."""
    C, H, W = features.shape
    x = coords[:, 0] * W - 0.5 if not align_corners else coords[:, 0] * (W - 1)
    y = coords[:, 1] * H - 0.5 if not align_corners else coords[:, 1] * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(yy, xx):
        yy_c = jnp.clip(yy.astype(jnp.int32), 0, H - 1)
        xx_c = jnp.clip(xx.astype(jnp.int32), 0, W - 1)
        valid = ((yy >= 0) & (yy <= H - 1) & (xx >= 0) & (xx <= W - 1))
        vals = features[:, yy_c, xx_c]          # [C, P]
        return jnp.where(valid[None, :], vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def point_sample_batch(features: jax.Array, coords: jax.Array, **kw):
    """[N, C, H, W], [N, P, 2] → [N, C, P]."""
    return jax.vmap(lambda f, c: point_sample(f, c, **kw))(features, coords)


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
