"""Hungarian matching — TPU-native.

The reference ships the cost matrix to the CPU and calls scipy's
``linear_sum_assignment`` per sample per decoder layer
(/root/reference/models/bbox/assigners/hungarian_assigner_3d.py:73-80). On
TPU that host round trip would dominate the step (and complicates pjit), so
the default solver here is an exact Jonker-Volgenant/Hungarian implemented
with ``lax.while_loop`` — it runs on device, vmaps over (layer, batch), and
is property-tested against scipy. A ``pure_callback`` scipy variant is kept
for cross-checking and host-preferred setups.

Static-shape contract: gt is padded to M slots with a validity mask; padded
rows get a constant cost (constant rows never change the optimum for real
rows) and their assignments are discarded by the caller via the mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_INF = 1e9
_PAD_COST = 1e6


def _hungarian_single(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact min-cost assignment of M rows to Q columns (M <= Q).

    cost: [M, Q] fp32. Returns col4row [M] int32 — the column assigned to
    each row. e-maxx Hungarian with potentials; O(M^2 Q)."""
    m, q = cost.shape
    c = jnp.zeros((m + 1, q + 1), cost.dtype).at[1:, 1:].set(cost)

    def outer(i, carry):
        u, v, p = carry
        p = p.at[0].set(i)
        minv = jnp.full(q + 1, _INF, cost.dtype)
        used = jnp.zeros(q + 1, bool)
        way = jnp.zeros(q + 1, jnp.int32)
        j0 = jnp.int32(0)

        def cond(st):
            u, v, p, minv, used, way, j0 = st
            return p[j0] != 0

        def body(st):
            u, v, p, minv, used, way, j0 = st
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = c[i0] - u[i0] - v                # [Q+1]
            upd = (cur < minv) & ~used
            minv = jnp.where(upd, cur, minv)
            way = jnp.where(upd, j0, way)
            masked = jnp.where(used, _INF, minv).at[0].set(_INF)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # potentials: u[p[j]] += delta for used j; v[j] -= delta
            row_hits = jnp.where(used, p, 0)
            u = u.at[row_hits].add(jnp.where(used, delta, 0.0))
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return (u, v, p, minv, used, way, j1)

        u, v, p, minv, used, way, j0 = jax.lax.while_loop(
            cond, body, (u, v, p, minv, used, way, j0))

        # augment along the alternating path back to the sentinel
        def aug_cond(st):
            j0, p = st
            return j0 != 0

        def aug_body(st):
            j0, p = st
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return (j1, p)

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        return (u, v, p)

    u0 = jnp.zeros(m + 1, cost.dtype)
    v0 = jnp.zeros(q + 1, cost.dtype)
    p0 = jnp.zeros(q + 1, jnp.int32)
    _, _, p = jax.lax.fori_loop(1, m + 1, outer, (u0, v0, p0))

    # invert: col4row[i] = j s.t. p[j] == i  (p[j]=0 -> unmatched col)
    col4row = jnp.zeros(m + 1, jnp.int32).at[p].set(
        jnp.arange(q + 1, dtype=jnp.int32))
    return col4row[1:] - 1  # 0-based column per row


def hungarian_matching(cost: jnp.ndarray, gt_mask: jnp.ndarray) -> jnp.ndarray:
    """Batched exact matching on device.

    cost: [..., M, Q] (rows = gt, cols = queries); gt_mask: [..., M] bool.
    Returns matched query index per gt row, [..., M] int32 (garbage where
    ~gt_mask — caller must mask).
    """
    cost = jnp.nan_to_num(cost, nan=100.0, posinf=100.0, neginf=-100.0)
    cost = jnp.where(gt_mask[..., None], cost, _PAD_COST)
    flat_cost = cost.reshape((-1,) + cost.shape[-2:])
    out = jax.vmap(_hungarian_single)(flat_cost)
    return out.reshape(cost.shape[:-1])


def _scipy_lsa(cost: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment
    out = np.zeros(cost.shape[:-2] + (cost.shape[-2],), np.int32)
    flat = cost.reshape((-1,) + cost.shape[-2:])
    of = out.reshape(-1, cost.shape[-2])
    for i, c in enumerate(flat):
        rows, cols = linear_sum_assignment(c)
        of[i, rows] = cols.astype(np.int32)
    return out


def hungarian_matching_callback(cost: jnp.ndarray,
                                gt_mask: jnp.ndarray) -> jnp.ndarray:
    """scipy ``linear_sum_assignment`` via host callback — the reference's
    exact solver, for cross-checks or host-preferred runs."""
    cost = jnp.nan_to_num(cost, nan=100.0, posinf=100.0, neginf=-100.0)
    cost = jnp.where(gt_mask[..., None], cost, _PAD_COST)
    out_shape = jax.ShapeDtypeStruct(cost.shape[:-1], jnp.int32)
    return jax.pure_callback(_scipy_lsa, out_shape, cost,
                             vmap_method="sequential")
