"""Fused Pallas TPU kernel: batched GF(2) Gaussian elimination with the
whole per-lane matrix VMEM-resident.

The XLA path (``ops.gf2_gauss.gf2_eliminate_ordered``) lowers to an n-trip
``fori_loop`` whose every trip re-reads and re-writes the full (B, m, n)
buffer from HBM plus several small reductions — at (B=64, 160, 280) that is
~36 ms/call, and AGC-ALP calls it once per cut round (``agc_alp.h:99-101``),
making it ~75% of the decode time. One lane's matrix is tiny (160x280 int
= 45 KB; f32 179 KB), so the entire elimination fits in VMEM.

Kernel layout: the matrix is carried TRANSPOSED, ``ht[g, j, i] = H[i, j]``
(columns of H live on the sublane axis), so the per-step pivot-column read
``H[:, c]`` is a cheap dynamic sublane slice, and row extraction/updates are
mask-multiply + lane reductions on the VPU. GF(2) XOR is computed in f32 as
``a + b - 2ab`` (exact for 0/1 values).

Semantics are bit-identical to the XLA path (and hence to ``CalculateGauss``,
``algo/agc_alp.h:44-72``): for each column in left-to-right (pre-permuted)
order, find the first row >= rank with a 1, swap it up to position ``rank``,
and XOR it out of every other row carrying a 1 in that column.

Grid is over lane groups of G lanes (G chosen to fit VMEM); an ``active``
SMEM mask lets groups whose lanes all skipped gauss this round pass through
untouched — in AGC-ALP most rounds need gauss for only a few lanes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gf2_eliminate_pallas", "pick_gauss_group"]

_VMEM_BUDGET = 10 * 1024 * 1024


def pick_gauss_group(bsz: int, n: int, m_pad: int, max_group: int = 8) -> int:
    """Largest G in {8,4,2,1} dividing bsz with ~3 G-lane copies in VMEM."""
    for g in (8, 4, 2, 1):
        if g > max_group:
            continue
        if bsz % g == 0 and 3 * g * n * m_pad * 4 <= _VMEM_BUDGET:
            return g
    return 1


def gauss_fits_vmem(m: int, n: int) -> bool:
    """Whether even a single lane's padded matrix (+ ~3 working copies)
    fits the kernel's VMEM budget. Callers on the "auto" path should fall
    back to the XLA elimination when this is False — a G=1 launch beyond
    budget dies in an opaque Mosaic compile error."""
    n_pad = -(-n // 8) * 8
    m_pad = -(-m // 128) * 128
    return 3 * n_pad * m_pad * 4 <= _VMEM_BUDGET


def _xor(a, b):
    return a + b - 2.0 * a * b


def _kernel(act_ref, ht_ref, out_ref, *, n_cols: int, m_rows: int,
            group: int):
    @pl.when(act_ref[0, 0, 0] == 0)
    def _skip():
        out_ref[...] = ht_ref[...]

    @pl.when(act_ref[0, 0, 0] != 0)
    def _run():
        m_pad = ht_ref.shape[-1]
        # Mosaic iota must be integer-typed
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (group, 1, m_pad), 2)
        in_range = iota_m < m_rows
        out_ref[...] = ht_ref[...]

        def step(c, rank):                       # rank: (G, 1, 1) int32
            # Mosaic supports dynamic (pl.ds) indexing on refs, not values:
            # the matrix lives in out_ref; the column read is a sublane
            # slice, the update writes the whole block back.
            ht = out_ref[0]                      # (G, n_pad, m_pad)
            col = out_ref[0, :, pl.ds(c, 1), :]  # (G, 1, m_pad)
            cand = (col > 0.5) & (iota_m >= rank) & in_range
            has = jnp.any(cand, axis=2, keepdims=True)            # (G,1,1)
            t = jnp.min(jnp.where(cand, iota_m, m_pad),
                        axis=2, keepdims=True)                    # (G,1,1)
            oh_t = jnp.where((iota_m == t) & has, 1.0, 0.0)       # (G,1,mp)
            oh_r = jnp.where((iota_m == rank) & has, 1.0, 0.0)
            # row contents at t and r (lane-masked reductions) -> (G, n, 1)
            row_t = jnp.sum(ht * oh_t, axis=2, keepdims=True)
            row_r = jnp.sum(ht * oh_r, axis=2, keepdims=True)
            # swap rows r <-> t (no-op when t == r or no pivot)
            ht = ht + (row_t - row_r) * (oh_r - oh_t)
            # eliminate: XOR the pivot row (now at r) out of every other
            # row with a 1 in column c. Column bits after the swap:
            col_t = jnp.sum(col * oh_t, axis=2, keepdims=True)
            col_r = jnp.sum(col * oh_r, axis=2, keepdims=True)
            col2 = col + (col_t - col_r) * (oh_r - oh_t)
            elim = jnp.where((col2 > 0.5) & (oh_r < 0.5) & has & in_range,
                             1.0, 0.0)                            # (G,1,mp)
            out_ref[0] = _xor(ht, row_t * elim)
            return rank + jnp.where(has, 1, 0)

        # early exit once every lane's rank saturates: later columns can
        # produce no pivot (cand requires a row >= rank) and the reference
        # loop would only skip through them (agc_alp.h:55-60)
        def w_cond(carry):
            c, rank = carry
            return (c < n_cols) & (jnp.min(rank) < m_rows)

        def w_body(carry):
            c, rank = carry
            return c + 1, step(c, rank)

        jax.lax.while_loop(w_cond, w_body,
                           (jnp.int32(0),
                            jnp.zeros((group, 1, 1), jnp.int32)))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "max_group"))
def gf2_eliminate_pallas(h_perm, active=None, *, interpret: bool = False,
                         max_group: int = 8):
    """Row-reduce (B, m, n) 0/1 matrices (any int/float dtype) w.r.t.
    left-to-right column order; same result as
    ``ops.gf2_gauss.gf2_eliminate_ordered``. ``active``: optional (B,) bool
    — groups of inactive lanes pass through unreduced (callers must mask
    their outputs). Returns (B, m, n) uint8.
    """
    bsz, m, n = h_perm.shape
    ht = jnp.transpose(h_perm.astype(jnp.float32), (0, 2, 1))   # (B, n, m)
    n_pad = -(-n // 8) * 8
    m_pad = -(-m // 128) * 128
    ht = jnp.pad(ht, [(0, 0), (0, n_pad - n), (0, m_pad - m)])

    g_sz = pick_gauss_group(bsz, n_pad, m_pad, max_group)
    n_grp = bsz // g_sz
    if active is None:
        act = jnp.ones((n_grp, 1, 1), jnp.int32)
    else:
        act = jnp.any(active.reshape(n_grp, g_sz), axis=1
                      ).astype(jnp.int32).reshape(n_grp, 1, 1)
    ht4 = ht.reshape(n_grp, g_sz, n_pad, m_pad)

    mat = pl.BlockSpec((1, g_sz, n_pad, m_pad), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    act_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, n_cols=n, m_rows=m, group=g_sz),
        grid=(n_grp,),
        in_specs=[act_spec, mat],
        out_specs=mat,
        out_shape=jax.ShapeDtypeStruct((n_grp, g_sz, n_pad, m_pad),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(act, ht4)
    out = out.reshape(bsz, n_pad, m_pad)[:, :n, :m]
    return (jnp.transpose(out, (0, 2, 1)) > 0.5).astype(jnp.uint8)
