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
    """Gather a [T, 3] table into a component-SoA V3 of flat [N] arrays.

    ONE [N, 3] row gather, then a column split. A TPU gather costs ~3 ms
    per 262k random indices *per gather op* regardless of slice width (it
    is latency-bound on the index stream), so one slice-3 gather beats
    three slice-1 gathers 3:1; the [N, 3] intermediate's 42.7x tile
    padding is only ~0.3 ms of HBM traffic in comparison.
    """
    from fountain_tpu.core.vecmath import V3
    r = _make_gather(table.shape[0])(table, idx)
    return V3(r[..., 0], r[..., 1], r[..., 2])


def take3(table: jnp.ndarray, idx: jnp.ndarray):
    """Non-custom-vjp variant of gather_rows3 for large tables (atlas
    texels): a row gather with the default scatter-add backward.

    The PLANAR components (not the [N, 3] rows) are tagged as ``rows``
    remat residuals: a saved f32[N, 3] buffer tile-pads 42.7x on TPU
    (3 -> 128 lanes, 128 MB per save at 262k) and blew HBM at compile
    time on env-mapped scenes; three flat [N] saves are pad-free."""
    from jax.ad_checkpoint import checkpoint_name
    from fountain_tpu.core.vecmath import V3
    r = table[idx]
    return V3(checkpoint_name(r[..., 0], "rows"),
              checkpoint_name(r[..., 1], "rows"),
              checkpoint_name(r[..., 2], "rows"))
