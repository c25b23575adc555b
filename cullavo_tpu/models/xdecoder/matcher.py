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


def lap_jv(cost: jax.Array) -> jax.Array:
    """Jittable exact rectangular assignment (Jonker–Volgenant shortest
    augmenting paths): ``cost [N, Q]`` with N jobs ≤ Q machines → the
    machine index per job, minimizing total cost.

    Device-side replacement for scipy's ``linear_sum_assignment``: axon PJRT
    rejects host callbacks entirely (``UNIMPLEMENTED: host send/recv``), and
    even where callbacks work they force a host sync per training step.
    Same optimum as scipy (ties may resolve differently); O(N²·Q) with all
    inner scans vectorized over machines.
    """
    N, Q = cost.shape
    INF = jnp.float32(1e18)
    c = cost.astype(jnp.float32)

    def assign_job(carry, i):
        u, v, p = carry
        minv = jnp.full((Q + 1,), INF)
        way = jnp.zeros((Q + 1,), jnp.int32)
        used = jnp.zeros((Q + 1,), bool)

        def dijkstra(state):
            j0, used, minv, way, u, v, _done = state
            used = used.at[j0].set(True)
            i0 = jnp.where(j0 == 0, i, p[j0] - 1)
            cur = jnp.concatenate([jnp.full((1,), INF), c[i0] - u[i0] - v[1:]])
            better = (~used) & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            cand = jnp.where(used, INF, minv)
            j1 = jnp.argmin(cand).astype(jnp.int32)
            delta = cand[j1]
            # potentials: u[job on each used machine] += delta (job i for the
            # root column), v[used machines] -= delta, minv[unused] -= delta
            add_u = jnp.zeros_like(u).at[i].add(jnp.where(used[0], delta, 0.0))
            occupied = used[1:] & (p[1:] > 0)
            add_u = add_u.at[jnp.where(occupied, p[1:] - 1, N)].add(
                jnp.where(occupied, delta, 0.0), mode="drop")
            u = u + add_u
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            done = p[j1] == 0
            return (j1, used, minv, way, u, v, done)

        state = (jnp.int32(0), used, minv, way, u, v, False)
        state = jax.lax.while_loop(lambda s: ~s[-1], dijkstra, state)
        j0, _used, _minv, way, u, v, _ = state

        def backtrack(state):
            j0, p, _done = state
            j1 = way[j0]
            p = p.at[j0].set(jnp.where(j1 == 0, i + 1, p[j1]))
            return (j1, p, j1 == 0)

        j0, p, _ = jax.lax.while_loop(lambda s: ~s[-1], backtrack,
                                      (j0, p, False))
        return (u, v, p), None

    u0 = jnp.zeros((N,), jnp.float32)
    v0 = jnp.zeros((Q + 1,), jnp.float32)
    p0 = jnp.zeros((Q + 1,), jnp.int32)
    (_, _, p), _ = jax.lax.scan(assign_job, (u0, v0, p0), jnp.arange(N))
    # invert: machine per job
    machines = jnp.arange(Q, dtype=jnp.int32)
    out = jnp.zeros((N,), jnp.int32)
    job_of_machine = p[1:] - 1                 # -1 = free
    out = out.at[jnp.where(job_of_machine >= 0, job_of_machine, N)].set(
        machines, mode="drop")
    return out


def hungarian_match_device(cost: jax.Array, n_valid: jax.Array):
    """Jittable equivalent of ``hungarian_match`` (device-side JV solver).

    Padded (invalid) target columns are given a large constant cost across
    all queries, so they absorb leftover queries without affecting the
    optimum over valid targets (any constant-cost row contributes the same
    total regardless of its machine)."""
    B, Q, N = cost.shape
    cost = jax.lax.stop_gradient(
        jnp.nan_to_num(cost, nan=1e8, posinf=1e8, neginf=-1e8))
    valid = jnp.arange(N)[None, :] < n_valid[:, None]          # [B, N]
    big = 1e7
    # jobs = targets (N ≤ Q); invalid jobs flattened to a constant cost
    cost_t = jnp.swapaxes(cost, 1, 2)                          # [B, N, Q]
    cost_t = jnp.where(valid[:, :, None], cost_t, big)
    rows = jax.vmap(lap_jv)(cost_t)                            # [B, N]
    return rows.astype(jnp.int32), valid


def hungarian_match(
    cost: jax.Array,     # [B, Q, N] (N = padded target count)
    n_valid: jax.Array,  # [B] number of real targets per element
):
    """Returns (src_idx [B, N], valid [B, N]): for target j of element b, the
    matched query index.

    On accelerators this runs the device-side JV solver (axon PJRT has no
    host callbacks, and a callback would force a host sync per train step);
    on CPU it keeps the scipy callback for bit-exact reference parity.
    ``CULLAVO_HOST_LAP=1`` forces the callback everywhere;
    ``CULLAVO_DEVICE_LAP=1`` forces the device-side JV solver everywhere —
    on the 8-virtual-CPU-device test mesh this makes the multichip dryrun
    exercise the SAME matcher path a real TPU pod runs (and kills the
    pure_callback's `{maximal device=0}` SPMD full-rematerialization)."""
    import os

    if os.environ.get("CULLAVO_DEVICE_LAP") == "1" or (
            jax.default_backend() != "cpu"
            and os.environ.get("CULLAVO_HOST_LAP") != "1"):
        return hungarian_match_device(cost, n_valid)
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
    coords: Optional[jax.Array] = None,
):
    """Device-side cost matrices with uniformly sampled points
    (matcher.py:106-168 'memory_efficient_forward').  ``coords`` [B, P, 2]
    overrides the uniform sampling (torch-parity tests)."""
    B, Q = pred_logits.shape[:2]
    N = tgt_classes.shape[1]

    probs = jax.nn.softmax(pred_logits, axis=-1)
    safe_cls = jnp.clip(tgt_classes, 0, pred_logits.shape[-1] - 1)
    cls_cost = -jnp.take_along_axis(probs, safe_cls[:, None, :], axis=2)  # [B, Q, N]

    if coords is None:
        coords = jax.random.uniform(rng, (B, num_points, 2))
    pred_pts = point_sample_batch(pred_masks, coords)          # [B, Q, P]
    # gt labels are BILINEARLY sampled, NOT binarized — the reference keeps
    # the fractional interpolated values at mask edges (matcher.py:133-138
    # point_sample on the float target with no threshold)
    tgt_pts = point_sample_batch(tgt_masks.astype(jnp.float32), coords)

    mask_cost = jax.vmap(batch_sigmoid_ce_cost)(pred_pts, tgt_pts)
    dice_cost = jax.vmap(batch_dice_cost)(pred_pts, tgt_pts)

    cost = cost_class * cls_cost + cost_mask * mask_cost + cost_dice * dice_cost
    cost = jnp.where(tgt_valid[:, None, :], cost, 1e8)
    return cost
