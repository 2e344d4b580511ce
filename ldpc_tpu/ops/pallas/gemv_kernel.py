"""Pallas TPU kernel: batched GEMV against the bf16-stored cut buffer.

The IPM backend (:mod:`ldpc_tpu.ops.ipm_solver`) runs 5-6 constraint matvecs
per Newton step — ``A x`` (brn,bn->br) and ``A^T y`` (brn,br->bn) against the
per-lane cut slice ``A`` (B, T, n) — all at ``Precision.HIGHEST`` because the
late Newton systems need f32-grade products. Through XLA einsums each matvec
re-streams the f32 buffer from HBM at ~200-300 GB/s effective and pays the
MXU's GEMV pathology (a 128-wide systolic pass computes one useful output
column).

This kernel maps the GEMV onto the **VPU** instead, with three structural
choices (all measured on v5e, ``scripts/prof/prof_gemv_tr.py``):

* **bf16 storage, f32 arithmetic.** Cut rows are ±1/0-valued — exact in
  bf16 (``alp.py:56``) — so storing A in bf16 halves the HBM stream; the
  kernel upconverts register-tiles to f32 and multiplies/accumulates in
  full f32, so the result is *more* accurate than the HIGHEST einsum
  (measured ~2e-7 relative agreement), with none of the 6-pass cost.
* **Transposed layout (B, n, T).** n = 280 is exactly 35 sublanes — zero
  padding — while T (the tier-ladder row slice) is already a 128-lane
  multiple. The natural (B, T, n) layout would pad n 280 -> 384 (+37%
  wasted elements) and put the forward reduction on the expensive
  cross-lane axis.
* **Lane groups per grid program** (shared ``pick_group_size``): one
  program owns G lanes' slices; Pallas double-buffers the next group's DMA
  behind the current group's VPU reduction.

Measured at the production (B=128, T=1152, n=280): 0.31 ms per fwd+tr pair
vs 0.54 ms for the HIGHEST einsum pair (1.75x; ~536 GB/s of bf16 A-stream);
2.0x at the T=640 tier. (Benchmark note: over the axon tunnel each jitted
call pays one ~27 ms RTT — measure with enough in-loop reps that the RTT
amortizes away, or the per-op numbers read 2-4x too slow.)

A historical trap, preserved here because it cost a debugging session: an
earlier MXU variant split the f32 vector into bf16 (hi, mid, lo) planes.
Under ``jit``, XLA:TPU's excess-precision simplification rewrites
``convert_f32(convert_bf16(x)) -> x``, so ``mid = bf16(x - f32(bf16(x)))``
silently collapses to zero and the product loses 8 bits with no error or
warning — eager mode, interpret mode, and CPU all compute it correctly.
``jax.lax.optimization_barrier`` around the *bf16 value* (not the
subtraction) blocks the rewrite. The VPU design needs no split, but any
future two-plane trick must keep that barrier.

Replaces the HIGHEST einsums at the IPM matvec call sites on TPU
(``matvec_backend="pallas"``); differential test vs the einsum path:
``tests/test_gemv_kernel.py``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pdhg_kernel import pick_group_size

__all__ = ["prepare_gemv", "batched_gemv", "batched_gemv_t",
           "normal_build"]

# VMEM budget for one grid program of the normal-build kernel (A slice +
# a bf16 plane + the f32 accumulator/output), double-buffering headroom
_VMEM_NORMAL_BUDGET = 5 * 1024 * 1024


def prepare_gemv(a):
    """(B, T, n) f32/bf16 cut rows -> transposed bf16 operand (B, n8, T)
    with n padded up to a sublane multiple of 8 (zero rows are inert)."""
    bsz, t_rows, n = a.shape
    assert t_rows % 128 == 0, f"row slice {t_rows} not a lane multiple"
    n8 = -(-n // 8) * 8
    at = jnp.swapaxes(a.astype(jnp.bfloat16), 1, 2)      # (B, n, T)
    if n8 != n:
        at = jnp.pad(at, [(0, 0), (0, n8 - n), (0, 0)])
    return at


def _fwd_kernel(a_ref, x_ref, o_ref, *, group: int):
    # a: (1, G, n8, T) bf16; x: (1, G, 1, n8) f32; o: (1, G, T) f32
    for g in range(group):
        a_g = a_ref[0, g].astype(jnp.float32)            # (n8, T)
        x_g = x_ref[0, g, 0]                             # (n8,)
        o_ref[0, g, :] = jnp.sum(a_g * x_g[:, None], axis=0)


def _tr_kernel(a_ref, y_ref, o_ref, *, group: int):
    # a: (1, G, n8, T) bf16; y: (1, G, 1, T) f32; o: (1, G, n8) f32
    for g in range(group):
        a_g = a_ref[0, g].astype(jnp.float32)            # (n8, T)
        y_g = y_ref[0, g]                                # (1, T)
        o_ref[0, g, :] = jnp.sum(a_g * y_g, axis=1)


def _call(kernel, at_bf, v, out_last, interpret, max_group):
    bsz, n8, t_rows = at_bf.shape
    g_sz = pick_group_size(bsz, t_rows, n8, max_group, a_bytes=2)
    n_grp = bsz // g_sz
    a4 = at_bf.reshape(n_grp, g_sz, n8, t_rows)
    v3 = v.reshape(n_grp, g_sz, 1, v.shape[-1])
    out = pl.pallas_call(
        functools.partial(kernel, group=g_sz),
        grid=(n_grp,),
        in_specs=[pl.BlockSpec((1, g_sz, n8, t_rows), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, g_sz, 1, v.shape[-1]),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, g_sz, out_last), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_grp, g_sz, out_last), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * t_rows * n8,
            bytes_accessed=2 * bsz * t_rows * n8,
            transcendentals=0),
        interpret=interpret,
    )(a4, v3)
    return out.reshape(bsz, out_last)


@functools.partial(jax.jit, static_argnames=("interpret", "max_group"))
def batched_gemv(at_bf, x, *, interpret: bool = False, max_group: int = 16):
    """y = A x per lane. at_bf (B, n8, T) from :func:`prepare_gemv`;
    x (B, n) f32 with n <= n8 (padded here). Returns (B, T) f32."""
    n8 = at_bf.shape[1]
    if x.shape[-1] != n8:
        x = jnp.pad(x, [(0, 0), (0, n8 - x.shape[-1])])
    return _call(_fwd_kernel, at_bf, x, at_bf.shape[2], interpret, max_group)


@functools.partial(jax.jit, static_argnames=("interpret", "max_group", "n"))
def batched_gemv_t(at_bf, y, n: int, *, interpret: bool = False,
                   max_group: int = 16):
    """z = A^T y per lane. at_bf (B, n8, T); y (B, T) f32. Returns
    (B, n) f32 (the n8 sublane padding sliced off)."""
    out = _call(_tr_kernel, at_bf, y, at_bf.shape[1], interpret, max_group)
    return out[:, :n]


def _normal_kernel(a_ref, d_ref, dxx_ref, o_ref, *, group: int,
                   delta: float):
    # a: (1, G, n8, T) bf16; d: (1, G, 1, T) f32; dxx: (1, G, 1, n8) f32;
    # o: (1, G, n8, n8) f32 — per lane M = A diag(d) A^T + diag(dxx) + dI.
    f32 = jnp.float32
    for g in range(group):
        a_g = a_ref[0, g]                                # (n8, T) bf16
        d_g = d_ref[0, g]                                # (1, T) f32
        # three bf16 planes of d; A is +-1/0-valued, so A * d_k is EXACT
        # in bf16 (|a_it * d_k| is d_k or 0) and the three MXU passes sum
        # to the full-f32 product — HIGHEST-einsum grade without the
        # 6-pass cost. In-kernel splitting is safe from the XLA
        # excess-precision rewrite (Mosaic compiles this body, not XLA).
        d_hi = d_g.astype(jnp.bfloat16)
        r1 = d_g - d_hi.astype(f32)
        d_mid = r1.astype(jnp.bfloat16)
        d_lo = (r1 - d_mid.astype(f32)).astype(jnp.bfloat16)
        acc = None
        for d_k in (d_hi, d_mid, d_lo):
            s_k = a_g * d_k                              # (n8, T) bf16 exact
            # precision pinned to DEFAULT: the operands are already exact
            # bf16 so one MXU pass IS the full product, and the caller's
            # default_matmul_precision("highest") context would otherwise
            # ask Mosaic for an fp32 contract on bf16 operands ("Bad lhs
            # type" compile error)
            m_k = jax.lax.dot_general(
                s_k, a_g, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.DEFAULT)     # (n8, n8)
            acc = m_k if acc is None else acc + m_k
        n8 = a_g.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (n8, n8), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n8, n8), 1)
        diag = jnp.where(row == col, dxx_ref[0, g, 0][:, None] + delta, 0.0)
        o_ref[0, g] = acc + diag


@functools.partial(jax.jit, static_argnames=("delta", "interpret",
                                             "max_group"))
def normal_build(at_bf, d, dxx, *, delta: float, interpret: bool = False,
                 max_group: int = 2):
    """M = A diag(d) A^T + diag(dxx) + delta*I per lane, f32.

    at_bf (B, n8, T) from :func:`prepare_gemv`; d (B, T) f32 >= 0;
    dxx (B, n) f32. Returns (B, n8, n8) — callers built against the
    unpadded n x n system slice [:, :n, :n] (the padded rows/cols are
    delta*I and inert).
    """
    bsz, n8, t_rows = at_bf.shape
    g_sz = 1
    for g in (max_group, 2, 1):
        if bsz % g == 0 and g * (3 * n8 * t_rows * 2 + 2 * n8 * n8 * 4) \
                <= _VMEM_NORMAL_BUDGET:
            g_sz = g
            break
    n_grp = bsz // g_sz
    a4 = at_bf.reshape(n_grp, g_sz, n8, t_rows)
    d3 = d.reshape(n_grp, g_sz, 1, t_rows)
    if dxx.shape[-1] != n8:
        dxx = jnp.pad(dxx, [(0, 0), (0, n8 - dxx.shape[-1])])
    x3 = dxx.reshape(n_grp, g_sz, 1, n8)
    out = pl.pallas_call(
        functools.partial(_normal_kernel, group=g_sz, delta=delta),
        grid=(n_grp,),
        in_specs=[pl.BlockSpec((1, g_sz, n8, t_rows), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, g_sz, 1, t_rows), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, g_sz, 1, n8), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, g_sz, n8, n8), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_grp, g_sz, n8, n8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=6 * bsz * n8 * n8 * t_rows,
            bytes_accessed=2 * bsz * n8 * t_rows + 4 * bsz * n8 * n8,
            transcendentals=0),
        interpret=interpret,
    )(a4, d3, x3)
    return out.reshape(bsz, n8, n8)
