"""Exact linear sum assignment (Hungarian matching), pure JAX.

The reference ships cost matrices to the CPU and calls scipy's
`linear_sum_assignment` (ref: models/modeling/matcher.py:131-134). A host
callback cannot run on every TPU runtime (and forces a device->host sync per
step), so this module solves the LSAP ON DEVICE with the same
shortest-augmenting-path algorithm scipy uses (Jonker-Volgenant style,
Crouse 2016): R rows are assigned one by one; each augmentation runs a
Dijkstra-like search over columns whose path can only traverse
already-assigned columns, so the inner loop is bounded by R+1 — everything
fits `lax.while_loop`/`lax.scan` with static shapes and vmaps over the batch.

For the matcher's shapes (R = padded target slots <= 16, C = 100 queries) the
whole batched solve is microseconds of VPU work. Exactness is verified
against scipy in tests (including degenerate ties, where any optimal
assignment is accepted).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.inf


def solve_lsap(cost: jnp.ndarray) -> jnp.ndarray:
    """cost: [R, C] with R <= C. Returns col4row [R] int32 — the column
    assigned to each row in the minimum-total-cost perfect matching of rows."""
    R, C = cost.shape
    assert R <= C, "solve_lsap expects R <= C (transpose if needed)"
    cost = jnp.asarray(cost, jnp.float32)

    def augment_row(state, cur_row):
        u, v, row4col, col4row = state

        # Dijkstra over columns; the path traverses assigned columns only.
        def dij_cond(s):
            return s[0] < 0

        def dij_body(s):
            sink, i, min_val, spc, path, sc, sr = s
            sr = sr.at[i].set(True)
            r = min_val + cost[i] - u[i] - v  # [C]
            better = (~sc) & (r < spc)
            spc = jnp.where(better, r, spc)
            path = jnp.where(better, i, path)
            masked = jnp.where(sc, INF, spc)
            # prefer an unassigned column on *exact* ties: nudge assigned
            # columns up by one ULP of their own magnitude (a fixed epsilon
            # like 1e-12 is below fp32 resolution for any realistic cost)
            finite = jnp.where(jnp.isfinite(masked), jnp.abs(masked), 0.0)
            nudge = jnp.where(row4col < 0, 0.0, jnp.spacing(finite))
            # argmin returns int64 when x64 is enabled — pin to int32 so the
            # while_loop carry keeps a stable dtype (the fp64 criterion
            # oracle runs this solver under jax.enable_x64)
            j = jnp.argmin(masked + nudge).astype(jnp.int32)
            min_val = masked[j]
            sc = sc.at[j].set(True)
            free = row4col[j] < 0
            sink = jnp.where(free, j, jnp.int32(-1))
            i = jnp.where(free, i, row4col[j])
            return (sink, i, min_val, spc, path, sc, sr)

        init = (
            jnp.int32(-1),
            cur_row,
            jnp.float32(0.0),
            jnp.full((C,), INF, jnp.float32),
            jnp.full((C,), -1, jnp.int32),
            jnp.zeros((C,), bool),
            jnp.zeros((R,), bool),
        )
        sink, _, min_val, spc, path, sc, sr = jax.lax.while_loop(
            dij_cond, dij_body, init
        )

        # dual updates (ref scipy _lsap.c)
        u = u.at[cur_row].add(min_val)
        other = sr & (jnp.arange(R) != cur_row)
        safe_col = jnp.clip(col4row, 0, C - 1)
        u = jnp.where(other, u + min_val - spc[safe_col], u)
        v = jnp.where(sc, v - (min_val - spc), v)

        # augment along the alternating path, <= R+1 swaps
        def aug_cond(s):
            done, *_ = s
            return ~done

        def aug_body(s):
            done, j, row4col, col4row = s
            i = path[j]
            row4col = row4col.at[j].set(i)
            prev = col4row[i]
            col4row = col4row.at[i].set(j)
            done = i == cur_row
            return (done, prev, row4col, col4row)

        _, _, row4col, col4row = jax.lax.while_loop(
            aug_cond, aug_body, (jnp.bool_(False), sink, row4col, col4row)
        )
        return (u, v, row4col, col4row), None

    init = (
        jnp.zeros((R,), jnp.float32),
        jnp.zeros((C,), jnp.float32),
        jnp.full((C,), -1, jnp.int32),
        jnp.full((R,), -1, jnp.int32),
    )
    (u, v, row4col, col4row), _ = jax.lax.scan(
        augment_row, init, jnp.arange(R, dtype=jnp.int32)
    )
    return col4row


def solve_lsap_small(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact LSAP for a SMALL row count (R <= ~4), fully vectorized.

    The JV solver above is a scan of data-dependent while_loops — correct
    everywhere, but its serial depth costs ~1.5 ms per matcher call on TPU
    even at R=3 (docs/PROFILE_r4.md). For the S4/MS3 matcher (R = 3 padded
    target slots) this closed form replaces it:

    An optimal assignment uses, for each row, one of that row's R
    smallest-cost columns. (Exchange argument: if row r used a column
    outside its top-R, then r has R strictly-cheaper-or-equal columns of
    which at most R-1 are occupied, so a free one exists; swapping r to it
    keeps the total optimal and strictly lowers r's rank — repeat until all
    rows sit inside their top-R.) So: take top-R columns per row, enumerate
    all R^R candidate choices (27 at R=3), mask tuples that reuse a column,
    and take the cheapest — one top_k + O(R^R * R) VPU ops, no serial loop.
    """
    R, C = cost.shape
    assert R <= C, "solve_lsap_small expects R <= C"
    cost = jnp.asarray(cost, jnp.float32)
    neg_topv, topi = jax.lax.top_k(-cost, R)  # per-row R smallest
    topv = -neg_topv  # [R, R]

    combos = jnp.stack(
        jnp.meshgrid(*([jnp.arange(R)] * R), indexing="ij"), axis=-1
    ).reshape(-1, R)  # [R^R, R] candidate-rank choices per row
    rows = jnp.arange(R)[None, :]
    cand_cols = topi[rows, combos]  # [R^R, R] actual column ids
    total = topv[rows, combos].sum(-1)  # [R^R]
    distinct = jnp.ones((combos.shape[0],), bool)
    for a in range(R):
        for b in range(a + 1, R):
            distinct &= cand_cols[:, a] != cand_cols[:, b]
    best = jnp.argmin(jnp.where(distinct, total, INF))
    return cand_cols[best].astype(jnp.int32)


# Above this row count the R^R enumeration loses to the JV scan
# (5^5 = 3125 tuples is still fine; 12^12 — the AVSS slot count — is not).
_SMALL_R_MAX = 5


def solve_lsap_batch(cost: jnp.ndarray) -> jnp.ndarray:
    """[N, R, C] -> [N, R]."""
    if cost.shape[1] <= _SMALL_R_MAX:
        return jax.vmap(solve_lsap_small)(cost)
    return jax.vmap(solve_lsap)(cost)
