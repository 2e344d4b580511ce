"""Fused Pallas TPU kernel: complete BP decode of a batch tile in VMEM.

The XLA BP path streams ~8 (B, E) tensors through HBM per iteration; this
kernel keeps the whole message state resident in VMEM for a batch tile and
runs the entire early-exit decode loop on-chip:

* grid over batch tiles of ``tile_b`` codewords;
* per iteration: check-node update in the phi domain on the VPU, then the
  column reduction ``total = llr + c2v @ S`` and the edge re-broadcast
  ``v2c = total @ S^T - c2v`` on the MXU (S is the static 0/1
  edge-incidence matrix), then the syndrome matmul ``bits @ H^T``;
* per-tile early exit: a ``lax.while_loop`` leaves as soon as every lane in
  the *tile* has converged — finer-grained than the XLA path's whole-batch
  exit, so easy tiles finish in a few iterations;
* HBM traffic: one read of the tile's LLRs, one write of bits/flags.

Semantics identical to ``BPDecoder`` layout="mxu" (sum-product, flooding,
estimate<=0 -> 1, per-lane freeze on first syndrome success).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...codes.graph import CodeGraph
from ..phi import PHI_ARG_MAX, PHI_ARG_MIN

NEUTRAL_LLR = 64.0

__all__ = ["make_bp_pallas_decoder"]


def _phi(x):
    x = jnp.clip(x, PHI_ARG_MIN, PHI_ARG_MAX)
    return -jnp.log(jnp.tanh(0.5 * x))


def _kernel(llr_ref, s_ref, st_ref, ht_ref, mask_ref, r_ref, rt_ref,
            bits_ref, done_ref, iters_ref, *, max_iter: int, m: int,
            dc: int, n: int, mm_dtype=jnp.float32, unroll: int = 1):
    llr = llr_ref[:]                                   # (Bt, n)
    mask = mask_ref[:]                                 # (1, m*dc) 0/1
    s = s_ref[:]                                       # (m*dc, n)
    st = st_ref[:]                                     # (n, m*dc)
    ht = ht_ref[:]                                     # (n, m)
    r_mat = r_ref[:]                                   # (m*dc, m) edge->row
    rt_mat = rt_ref[:]                                 # (m, m*dc)
    bt = llr.shape[0]

    def mm(a, w):
        return jnp.dot(a.astype(mm_dtype), w.astype(mm_dtype),
                       preferred_element_type=jnp.float32)

    def check_update(v2c):
        # Mosaic has no (Bt, md) -> (Bt, m, dc) reshape; express the per-row
        # reduce + re-broadcast as one-hot matmuls (edge->row->edge). The
        # magnitude and sign-count reductions share the same (r, r^T) pair,
        # so stack them along the sublane axis: two (2Bt, .) matmuls instead
        # of four (Bt, .) ones — same flops, half the MXU dispatches, and a
        # deeper pipe through the systolic array.
        neg = jnp.where((v2c <= 0.0) & (mask > 0), 1.0, 0.0)   # (Bt, md)
        mag = jnp.where(mask > 0, _phi(jnp.abs(v2c)), 0.0)
        both = jnp.concatenate([mag, neg], axis=0)             # (2Bt, md)
        edge = mm(mm(both, r_mat), rt_mat)                     # row sums
        srow_e, nneg_e = edge[:bt], edge[bt:]
        sign_e = 1.0 - 2.0 * neg
        sign_tot = 1.0 - 2.0 * (nneg_e % 2.0)
        c2v = sign_tot * sign_e * _phi(srow_e - mag)
        return jnp.where(mask > 0, c2v, 0.0)

    def iteration(v2c):
        c2v = check_update(v2c)
        total = llr + mm(c2v, s)
        v2c_next = jnp.where(mask > 0, mm(total, st) - c2v, NEUTRAL_LLR)
        bits = jnp.where(total <= 0.0, 1.0, 0.0)
        return v2c_next, bits

    v2c0 = jnp.where(mask > 0, mm(llr, st), NEUTRAL_LLR)
    bits_ref[:] = jnp.where(llr <= 0.0, 1.0, 0.0)
    done_ref[:] = jnp.zeros((bt, 1), jnp.float32)
    iters_ref[:] = jnp.full((bt, 1), float(max_iter), jnp.float32)

    # Mosaic dislikes (Bt,1)/bool vectors in the loop carry; mutate the
    # output refs instead and carry only (iter, all_done scalar, v2c).
    # ``unroll`` iterations run per while_loop trip — the per-iteration
    # syndrome check and freeze semantics are unchanged (each unrolled
    # iteration still checks and records its own exit); only the loop
    # condition (a tile-wide min-reduce + scalar compare) amortizes.
    def body(state):
        it, _, v2c = state
        for u in range(unroll):
            v2c, bits_new = iteration(v2c)
            parity = mm(bits_new, ht)
            frac = parity - 2.0 * jnp.floor(parity * 0.5)  # parity mod 2
            bad = jnp.sum(frac, axis=-1, keepdims=True)    # 0 iff codeword
            done_prev = done_ref[:]
            ok = jnp.where(bad < 0.5, 1.0, 0.0)
            newly = ok * (1.0 - done_prev)
            bits_ref[:] = jnp.where(done_prev > 0.0, bits_ref[:], bits_new)
            iters_ref[:] = jnp.where(newly > 0.0, jnp.float32(it + u + 1),
                                     iters_ref[:])
            done_ref[:] = jnp.maximum(done_prev, ok)
        all_done = jnp.min(done_ref[:]) > 0.0
        return it + unroll, all_done, v2c

    def cond(state):
        it, all_done, _ = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(all_done))

    jax.lax.while_loop(cond, body, (jnp.int32(0), False, v2c0))


def make_bp_pallas_decoder(h, max_iter: int = 50, tile_b: int = 128,
                           mm_dtype=jnp.float32, unroll: int = 1):
    """Returns a jitted fn llrs (B, n) -> (bits i32, done i32 (B,1),
    iters i32 (B,1)); B must be a multiple of tile_b."""
    if max_iter % max(unroll, 1):
        unroll = 1                     # keep the exact max_iter semantics
    g = CodeGraph.from_h(np.asarray(h))
    m, n, dc = g.m, g.n, g.dc_max
    md = m * dc
    s = np.zeros((md, n), np.float32)
    cols = g.row_col.reshape(-1)
    valid = g.row_mask.reshape(-1)
    s[np.arange(md)[valid], cols[valid]] = 1.0
    s_dev = jnp.asarray(s)
    st_dev = jnp.asarray(s.T.copy())
    ht_dev = jnp.asarray(g.h.astype(np.float32).T.copy())
    mask_dev = jnp.asarray(valid.astype(np.float32)[None, :])
    r_np = np.zeros((md, m), np.float32)
    r_np[np.arange(md), np.arange(md) // dc] = 1.0
    r_dev = jnp.asarray(r_np)
    rt_dev = jnp.asarray(r_np.T.copy())

    kernel = functools.partial(_kernel, max_iter=max_iter, m=m, dc=dc, n=n,
                               mm_dtype=mm_dtype, unroll=max(unroll, 1))

    @jax.jit
    def decode(llrs):
        b = llrs.shape[0]
        assert b % tile_b == 0, f"batch {b} not a multiple of {tile_b}"
        grid = (b // tile_b,)
        tile = lambda i: (i, 0)
        fixed = lambda i: (0, 0)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_b, n), tile, memory_space=pltpu.VMEM),
                pl.BlockSpec((md, n), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((n, md), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((n, m), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, md), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((md, m), fixed, memory_space=pltpu.VMEM),
                pl.BlockSpec((m, md), fixed, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_b, n), tile, memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_b, 1), tile, memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_b, 1), tile, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, n), jnp.float32),
                jax.ShapeDtypeStruct((b, 1), jnp.float32),
                jax.ShapeDtypeStruct((b, 1), jnp.float32),
            ],
        )(llrs.astype(jnp.float32), s_dev, st_dev, ht_dev, mask_dev,
          r_dev, rt_dev)
        bits_f, done_f, iters_f = out
        return (bits_f.astype(jnp.int32), done_f.astype(jnp.int32),
                iters_f.astype(jnp.int32))

    return decode
