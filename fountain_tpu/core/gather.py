"""Differentiable row gathers with TPU-friendly backward passes.

``table[idx]`` differentiates to a scatter-add, which XLA executes as a
serialized-ish scatter on TPU — measured ~40 ms per 262k-lane gather into a
3-row texture table (10x the forward cost). For small tables the transpose
of a gather is a dense masked reduction: grad[t] = sum_n [idx_n == t] g_n,
which maps onto one small matmul (the one-hot trick) and runs in
microseconds. Large tables keep the scatter (the one-hot matrix would not
fit); image-atlas gradients go through the mipmap layer instead.

Reference analog: none — the reference is not differentiable; this is pure
TPU-backward engineering.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# above this row count the [N, T] one-hot matrix costs more than the scatter
ONE_HOT_MAX_ROWS = 512
# tables this small are "gathered" with a select-sum over rows — pure
# broadcast/where VPU ops that fuse into neighbors, instead of a real
# gather op. Measured on v5e: a 262k-index row gather costs ~2.3 ms
# REGARDLESS of table size (latency-bound on the index stream); the
# round-3 bench step spent ~80% of its 740 ms in ~250 such gathers,
# most into 1-row material/light tables.
SELECT_MAX_ROWS = 8


def _take_small(table, idx):
    """table[idx] for tiny tables via select-sum (no gather op)."""
    if table.shape[0] == 1:
        return jnp.broadcast_to(
            table[0], idx.shape + table.shape[1:]).astype(table.dtype)
    exp = idx.reshape(idx.shape + (1,) * (table.ndim - 1))
    out = None
    for m in range(table.shape[0]):
        row = table[m]
        term = jnp.where(exp == m, row, 0).astype(table.dtype)
        out = term if out is None else out + term
    return out


@functools.lru_cache(maxsize=None)
def _make_gather(t_rows: int):
    take = _take_small if t_rows <= SELECT_MAX_ROWS else \
        (lambda table, idx: table[idx])

    @jax.custom_vjp
    def f(table, idx):
        return take(table, idx)

    def fwd(table, idx):
        return take(table, idx), idx

    def bwd(idx, g):
        flat_idx = idx.reshape(-1)
        row_shape = g.shape[idx.ndim:]
        g2 = g.reshape((flat_idx.size, -1)).astype(jnp.float32)
        if t_rows <= ONE_HOT_MAX_ROWS:
            one_hot = (flat_idx[:, None]
                       == jnp.arange(t_rows, dtype=flat_idx.dtype)[None, :])
            grad = jnp.einsum("nt,nc->tc", one_hot.astype(jnp.float32), g2,
                              precision=jax.lax.Precision.HIGHEST)
        else:
            grad = jnp.zeros((t_rows, g2.shape[1]), jnp.float32
                             ).at[flat_idx].add(g2)
        return grad.reshape((t_rows,) + row_shape).astype(g.dtype), None

    f.defvjp(fwd, bwd)
    return f


def select_rows(table: jnp.ndarray, idx: jnp.ndarray,
                limit: int = 64) -> jnp.ndarray:
    """``table[idx]`` for small per-scene constant tables via select-sum —
    zero gather ops, fuses into consumers.

    Round-5 profile: per-lane indexing of tiny tables (texture uv_scale
    [4,2], mipmap level_offset [1,16]) compiled to real gather ops at
    ~2-6 ms per 262k indices each; the rematted backward re-executed
    hundreds of them (~665 ms/step, 4x the whole forward). A select-sum
    over <= ``limit`` scalar rows is pure VPU compare/add that fuses to
    ~zero. Tables larger than ``limit`` fall back to a real gather.

    Unlike ``gather_rows`` this has no custom one-hot backward: intended
    for non-differentiated int/layout tables (ids, offsets, uv mapping).
    """
    if table.shape[0] <= limit:
        return _take_small(table, idx)
    return table[idx]


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` with a dense (one-hot matmul) backward for small
    tables. table: [T, ...C]; idx: int [...N]; returns [...N, ...C].

    Tables with <= SELECT_MAX_ROWS rows are fetched with fusable
    select-sums instead of a gather op (see above). NOTE: do NOT
    checkpoint_name the [N, C] rows — a saved f32[N, C<128] buffer
    tile-pads to 128 lanes (134 MB per save at 262k lanes) and blows HBM
    at compile time; use ``col_saver`` on the extracted flat columns."""
    return _make_gather(table.shape[0])(table, idx)


def col_saver(rows: jnp.ndarray, name: str = "rows"):
    """Column extractor that tags each flat [N] column as a named remat
    residual: ``col = col_saver(rows); x = col(k)``. Saving the planar
    columns (pad-free) instead of the [N, C] rows keeps the remat from
    re-gathering in the backward without the 128-lane padding blowup."""
    from jax.ad_checkpoint import checkpoint_name

    def col(k):
        return checkpoint_name(rows[:, k], name)
    return col


def gather_rows3(table: jnp.ndarray, idx: jnp.ndarray):
    """Gather a [T, 3] table into a component-SoA V3 of flat [N] arrays,
    with the dense one-hot backward of ``gather_rows`` for small tables
    (texture value rows — differentiable).

    Small tables resolve to per-column select-sums (zero gather ops);
    large ones fall back to one [N, 3] row gather inside ``gather_rows``.
    """
    from fountain_tpu.core.vecmath import V3
    if table.shape[0] <= SELECT_MAX_ROWS:
        f = _make_gather(table.shape[0])
        return V3(f(table[:, 0], idx), f(table[:, 1], idx),
                  f(table[:, 2], idx))
    r = _make_gather(table.shape[0])(table, idx)
    return V3(r[..., 0], r[..., 1], r[..., 2])


def gather_cols(table: jnp.ndarray, idx: jnp.ndarray, name: str = "rows"):
    """Per-COLUMN accessor over ``table[idx]`` that never materializes the
    [N, C] row block: returns ``col(k) -> table[idx, k]`` as a flat [N]
    array, tagged as a ``name`` remat residual.

    Why: on TPU a row gather's column extracts force producer fusions to
    emit f32[N,1]{T(8,128)} buffers padded 128x (134 MB per column at
    262k lanes — the round-5 profile). Flat [N] arrays never pad, and
    independent flat gathers run at HBM speed (~0.005 ms each at 262k).

    Small tables (<= SELECT_MAX_ROWS rows) use per-column select-sums of
    SCALARS — pure elementwise ops that fuse into consumers, cost ZERO
    gathers, and differentiate through the table naturally. Larger
    tables do ONE [N, C] row gather and extract columns: on v5e a gather
    costs ~2-6 ms per 262k indices REGARDLESS of slice width (verified
    round 5 with on-device traces — wall-clock microbenches lie here, the
    axon runtime acks at enqueue), so one wide gather beats per-column
    flat gathers C:1 and the [N, 1]-padded extract traffic (~0.2 ms per
    column) is comparatively free.
    """
    from jax.ad_checkpoint import checkpoint_name
    rows_n, c_width = table.shape
    if rows_n <= SELECT_MAX_ROWS:
        def col(k):
            acc = jnp.where(idx == 0, table[0, k], 0.0) if rows_n > 1 \
                else jnp.broadcast_to(table[0, k], idx.shape)
            for m in range(1, rows_n):
                acc = acc + jnp.where(idx == m, table[m, k], 0.0)
            return checkpoint_name(acc, name)
    else:
        rows = table[idx]                   # ONE [N, C] row gather

        def col(k):
            return checkpoint_name(rows[:, k], name)
    return col


@jax.custom_vjp
def permute_rows(x: jnp.ndarray, perm: jnp.ndarray, inv: jnp.ndarray):
    """``x[perm]`` for a *permutation* ``perm`` with inverse ``inv``.

    The default VJP of a gather is a scatter-add (~1.2 ms per 262k lanes
    on v5e); for a permutation the transpose is just a gather by the
    inverse (~0.2 ms). Used by the per-bounce wavefront reorder in
    integrator.path (the reorder's gradient flows through beta/radiance).
    """
    return x[perm]


def _permute_rows_fwd(x, perm, inv):
    return x[perm], inv


def _permute_rows_bwd(inv, g):
    return g[inv], None, None


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def take3(table: jnp.ndarray, idx: jnp.ndarray):
    """Gather [T, 3] rows as a component-SoA V3 via three FLAT gathers of
    the reshaped [3T] array (large tables — atlas texels — keep the
    default scatter-add backward for texel gradients).

    ONE [N, 3] row gather, then channel extracts: a v5e gather costs
    ~2-6 ms per 262k indices regardless of slice width, so one slice-3
    gather beats three flat gathers 3:1. The PLANAR components (not the
    [N, 3] rows) are tagged as ``rows`` remat residuals — pad-free [N]
    saves (a saved [N, 3] buffer tile-pads 42.7x and blew HBM on
    env-mapped scenes in round 3)."""
    from jax.ad_checkpoint import checkpoint_name
    from fountain_tpu.core.vecmath import V3
    r = table[idx]
    return V3(checkpoint_name(r[..., 0], "rows"),
              checkpoint_name(r[..., 1], "rows"),
              checkpoint_name(r[..., 2], "rows"))
