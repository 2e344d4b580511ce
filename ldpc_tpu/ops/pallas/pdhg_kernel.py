"""Fused Pallas TPU kernel: a whole PDHG chunk with the constraint slice
resident in VMEM.

The XLA PDHG path (``ops.lp_solver.pdhg_box_lp``) re-streams the per-lane
constraint buffer ``A`` (B, T, n) from HBM twice per iteration (A^T y and
A x matvecs) — at typical ALP/AGC-ALP sizes that is ~150-350 MB of HBM
traffic *per iteration*, and the solve runs hundreds of iterations per cut
round. One lane's active slice is however tiny (<= 1152 x 384 f32 = 1.8 MB),
far under the ~16 MB/core VMEM budget.

This kernel flips the loop order: grid over lanes, one program per lane; the
lane's A slice is DMA'd into VMEM once (Pallas double-buffers the next
lane's slice behind the current lane's compute) and the entire
``iters``-step PDHG recursion runs on-chip:

    x <- clip_[0,1](x - tau * (c + A^T y))
    y <- max(0, y + sigma * (A (2x' - x) - b))

After the loop the kernel also emits the lane's max primal violation
``max(A x - b, 0)`` so the caller's tolerance loop needs no extra matvec.

Shapes are padded to TPU tiles by the wrapper: n -> multiple of 128 (zero
columns are inert: tau column-sums are 0 there, x stays at its 0 init), and
the row slice T must be a multiple of 128 (the ALP tier ladder guarantees
it). Replaces GLPK (``glp_simplex`` dual simplex, ``algo/alp.h:117-124``,
``algo/agc_alp.h:94-101``) in the adaptive-LP cut loops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pdhg_chunk_pallas"]


def _kernel(c_ref, a_ref, b_ref, tau_ref, sigma_ref, x_ref, y_ref,
            xo_ref, yo_ref, viol_ref, *, iters: int):
    a = a_ref[0]              # (T, n_pad), VMEM-resident for the whole chunk
    c = c_ref[0]              # (1, n_pad)
    tau = tau_ref[0]          # (1, n_pad)
    b = b_ref[0]              # (1, T)
    sigma = sigma_ref[0]      # (1, T)

    def matvec_at_y(y):       # (1, T) @ (T, n) -> (1, n)
        return jax.lax.dot_general(
            y, a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def matvec_ax(x):         # (1, n) @ (T, n)^T -> (1, T)
        return jax.lax.dot_general(
            x, a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def body(_, carry):
        x, y = carry
        x_new = jnp.clip(x - tau * (c + matvec_at_y(y)), 0.0, 1.0)
        y_new = jnp.maximum(0.0, y + sigma * (matvec_ax(2.0 * x_new - x) - b))
        return x_new, y_new

    x, y = jax.lax.fori_loop(0, iters, body, (x_ref[0], y_ref[0]))
    xo_ref[0] = x
    yo_ref[0] = y
    viol_ref[0, 0, 0] = jnp.max(jnp.maximum(matvec_ax(x) - b, 0.0))


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def pdhg_chunk_pallas(c, a, b, tau, sigma, x, y, *, iters: int,
                      interpret: bool = False):
    """Run ``iters`` PDHG steps per lane with A VMEM-resident.

    c, tau, x: (B, n); a: (B, T, n); b, sigma, y: (B, T). T must be a
    multiple of 128; n is padded here. Returns (x', y', viol (B,)).
    """
    bsz, t_rows, n = a.shape
    assert t_rows % 128 == 0, f"row slice {t_rows} not a multiple of 128"
    n_pad = -(-n // 128) * 128
    if n_pad != n:
        pad = [(0, 0), (0, n_pad - n)]
        c = jnp.pad(c, pad)
        tau = jnp.pad(tau, pad)
        x = jnp.pad(x, pad)
        a = jnp.pad(a, [(0, 0), (0, 0), (0, n_pad - n)])

    # vectors carry a unit sublane axis — Mosaic requires the last two block
    # dims to be (8k, 128k) or the full array dims, so (1, X) blocks of a
    # (B, X) array are rejected while (1, 1, X) blocks of (B, 1, X) pass
    c3, tau3, x3 = (v[:, None, :] for v in (c, tau, x))
    b3, sigma3, y3 = (v[:, None, :] for v in (b, sigma, y))

    lane = lambda i: (i, 0)                       # noqa: E731
    lane3 = lambda i: (i, 0, 0)                   # noqa: E731
    vec_n = pl.BlockSpec((1, 1, n_pad), lane3, memory_space=pltpu.VMEM)
    vec_t = pl.BlockSpec((1, 1, t_rows), lane3, memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((1, t_rows, n_pad), lane3, memory_space=pltpu.VMEM)

    xo, yo, viol = pl.pallas_call(
        functools.partial(_kernel, iters=iters),
        grid=(bsz,),
        in_specs=[vec_n, mat, vec_t, vec_n, vec_t, vec_n, vec_t],
        out_specs=[vec_n, vec_t,
                   pl.BlockSpec((1, 1, 1), lane3, memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((bsz, 1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, 1, t_rows), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, 1, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * iters * bsz * t_rows * n_pad,
            bytes_accessed=4 * bsz * t_rows * n_pad,
            transcendentals=0),
        interpret=interpret,
    )(c3, a, b3, tau3, sigma3, x3, y3)
    return xo[:, 0, :n], yo[:, 0], viol[:, 0, 0]
