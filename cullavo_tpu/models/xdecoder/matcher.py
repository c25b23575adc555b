"""Hungarian matcher for set prediction (JAX + host scipy assignment).

Capability parity with modeling/modules/matcher.py:78-603: cost = class
(-softmax prob at the target class) + point-sampled sigmoid-BCE mask cost +
point-sampled dice cost, solved per batch element with scipy's
``linear_sum_assignment`` — the exact solver the reference uses, invoked via
``jax.pure_callback`` so metric parity is preserved while the cost matrices
are computed on device with static shapes (padded targets + validity masks).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cullavo_tpu.ops.point_sample import point_sample_batch


def batch_sigmoid_ce_cost(inputs: jax.Array, targets: jax.Array) -> jax.Array:
    """inputs [Q, P] logits, targets [N, P] in {0,1} → [Q, N] mean-BCE cost."""
    P = inputs.shape[-1]
    pos = jax.nn.softplus(-inputs)        # -log sigmoid(x)
    neg = jax.nn.softplus(inputs)         # -log(1 - sigmoid(x))
    return (pos @ targets.T + neg @ (1.0 - targets.T)) / P


def batch_dice_cost(inputs: jax.Array, targets: jax.Array) -> jax.Array:
    """inputs [Q, P] logits, targets [N, P] → [Q, N] (1 - dice)."""
    probs = jax.nn.sigmoid(inputs)
    numerator = 2.0 * (probs @ targets.T)
    denominator = probs.sum(-1)[:, None] + targets.sum(-1)[None, :]
    return 1.0 - (numerator + 1.0) / (denominator + 1.0)


def _lsa_host(cost: np.ndarray, n_valid: np.ndarray):
    """Host callback: per-batch Hungarian assignment on the valid columns."""
    from scipy.optimize import linear_sum_assignment

    B, Q, N = cost.shape
    rows = np.zeros((B, N), np.int32)
    valid = np.zeros((B, N), np.bool_)
    for b in range(B):
        n = int(n_valid[b])
        if n == 0:
            continue
        r, c = linear_sum_assignment(cost[b, :, :n])
        # r[k] is the query assigned to target c[k]; reorder by target index
        order = np.argsort(c)
        rows[b, :n] = r[order].astype(np.int32)
        valid[b, :n] = True
    return rows, valid


def hungarian_match(
    cost: jax.Array,     # [B, Q, N] (N = padded target count)
    n_valid: jax.Array,  # [B] number of real targets per element
):
    """Returns (src_idx [B, N], valid [B, N]): for target j of element b, the
    matched query index.  Exact scipy assignment via host callback."""
    B, Q, N = cost.shape
    out_shapes = (jax.ShapeDtypeStruct((B, N), jnp.int32),
                  jax.ShapeDtypeStruct((B, N), jnp.bool_))
    # matching indices are non-differentiable constants (DETR detaches the
    # matcher); stop_gradient also keeps the pure_callback off the JVP path
    cost = jax.lax.stop_gradient(
        jnp.nan_to_num(cost, nan=1e8, posinf=1e8, neginf=-1e8))
    return jax.pure_callback(_lsa_host, out_shapes, cost, n_valid,
                             vmap_method="sequential")


def compute_match_costs(
    pred_logits: jax.Array,     # [B, Q, C]
    pred_masks: jax.Array,      # [B, Q, H, W]
    tgt_classes: jax.Array,     # [B, N] (padded)
    tgt_masks: jax.Array,       # [B, N, H, W] {0,1}
    tgt_valid: jax.Array,       # [B, N] bool
    rng: jax.Array,
    num_points: int = 12544,
    cost_class: float = 2.0,
    cost_mask: float = 5.0,
    cost_dice: float = 5.0,
):
    """Device-side cost matrices with uniformly sampled points
    (matcher.py:106-168 'memory_efficient_forward')."""
    B, Q = pred_logits.shape[:2]
    N = tgt_classes.shape[1]

    probs = jax.nn.softmax(pred_logits, axis=-1)
    safe_cls = jnp.clip(tgt_classes, 0, pred_logits.shape[-1] - 1)
    cls_cost = -jnp.take_along_axis(probs, safe_cls[:, None, :], axis=2)  # [B, Q, N]

    coords = jax.random.uniform(rng, (B, num_points, 2))
    pred_pts = point_sample_batch(pred_masks, coords)          # [B, Q, P]
    tgt_pts = point_sample_batch(tgt_masks.astype(jnp.float32), coords)
    tgt_pts = (tgt_pts > 0.5).astype(jnp.float32)

    mask_cost = jax.vmap(batch_sigmoid_ce_cost)(pred_pts, tgt_pts)
    dice_cost = jax.vmap(batch_dice_cost)(pred_pts, tgt_pts)

    cost = cost_class * cls_cost + cost_mask * mask_cost + cost_dice * dice_cost
    cost = jnp.where(tgt_valid[:, None, :], cost, 1e8)
    return cost
