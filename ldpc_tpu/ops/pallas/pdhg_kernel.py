"""Fused Pallas TPU kernel: a whole PDHG chunk with the constraint slices
resident in VMEM, multiple lanes per grid program.

The XLA PDHG path (``ops.lp_solver.pdhg_box_lp``) re-streams the per-lane
constraint buffer ``A`` (B, T, n) from HBM twice per iteration (A^T y and
A x matvecs) — at typical ALP/AGC-ALP sizes that is ~150-350 MB of HBM
traffic *per iteration*, and the solve runs hundreds of iterations per cut
round. One lane's active slice is however tiny (<= 1408 x 384 f32 = 2.2 MB),
far under the ~16 MB/core VMEM budget.

This kernel flips the loop order: grid over lane *groups* of G lanes; the
group's A slices are DMA'd into VMEM once (Pallas double-buffers the next
group behind the current group's compute) and the entire ``iters``-step PDHG
recursion runs on-chip:

    x <- clip_[0,1](x - tau * (c + A^T y))
    y <- max(0, y + sigma * (A (2x' - x) - b))

Grouping G lanes per program is the key MXU-latency fix: one lane's matvec is
a rank-1 matmul — (1, T) @ (T, n) — whose issue latency dominates its
(tiny) FLOP count, so a single-lane program leaves the MXU idle between
dependent iterations. G lanes give 2G *independent* rank-1 matmuls per
iteration that pipeline through the systolic array back-to-back (measured
~4-6x at T<=512 on v5e). G is chosen per row-tier so the group's slices fit
the VMEM budget alongside double buffering.

After the loop the kernel emits each lane's combined convergence error
``max(max(A x - b, 0), relative duality gap)`` so the caller's tolerance
loop needs no extra matvec,
and an ``active`` group mask lets converged/frozen lane groups skip the
entire chunk (their DMA still streams, but the 2G*iters matmuls do not run —
in the ALP cut loops most lanes finish rounds before the stragglers).

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

__all__ = ["pdhg_chunk_pallas", "pick_group_size"]

# VMEM budget for one group's A slices (bytes); with Pallas double-buffering
# the next group's DMA, peak A residency is ~2x this. 6 MB leaves ~4 MB for
# vectors/accumulators out of the ~16 MB/core on v5e.
_VMEM_A_BUDGET = 6 * 1024 * 1024


def pick_group_size(bsz: int, t_rows: int, n_pad: int,
                    max_group: int = 16, a_bytes: int = 4) -> int:
    """Largest G in {16,8,4,2,1} dividing bsz with G*T*n_pad*a_bytes
    within budget. ``a_bytes`` defaults to the conservative f32 width —
    the bf16 storage width is opt-in at the call site (the wrapper passes
    ``a.dtype.itemsize`` after deciding the storage dtype)."""
    for g in (16, 8, 4, 2, 1):
        if g > max_group:
            continue
        if bsz % g == 0 and g * t_rows * n_pad * a_bytes <= _VMEM_A_BUDGET:
            return g
    return 1


def _kernel(act_ref, c_ref, a_ref, b_ref, tau_ref, sigma_ref, x_ref, y_ref,
            xo_ref, yo_ref, viol_ref, *, iters: int, group: int,
            average: bool):
    g_sz = group
    # A is stored bf16 on TPU (cut rows are ±1-valued — exact in bf16;
    # and the MXU's DEFAULT f32 matmul path rounds the vector operand to
    # bf16 anyway, so the explicit cast below is bit-identical to the old
    # f32 storage) — halving VMEM doubles the lane-group size G.
    a_dt = a_ref.dtype

    def lane_err(x_g, y_g, c_g, a_g, b_g):
        """max(primal violation, relative duality gap) — primal feasibility
        alone is a trap: a warm-started PDHG iterate can be feasible long
        before it is *optimal*, and the ALP cut search at a suboptimal point
        emits cuts that do not separate the true LP optimum (budget-burning
        junk cuts — the round-2 AGC-ALP FER gap)."""
        ax = jax.lax.dot_general(x_g.astype(a_dt), a_g,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        viol = jnp.max(jnp.maximum(ax - b_g, 0.0))
        aty = jax.lax.dot_general(y_g.astype(a_dt), a_g,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        rc = c_g + aty
        pobj = jnp.sum(c_g * x_g)
        dobj = -jnp.sum(b_g * y_g) + jnp.sum(jnp.minimum(rc, 0.0))
        gap = (pobj - dobj) / (1.0 + jnp.abs(pobj) + jnp.abs(dobj))
        return jnp.maximum(viol, gap)

    @pl.when(act_ref[0, 0, 0] == 0)
    def _skip():
        xo_ref[...] = x_ref[...]
        yo_ref[...] = y_ref[...]
        for g in range(g_sz):
            viol_ref[0, 0, g] = 0.0

    @pl.when(act_ref[0, 0, 0] != 0)
    def _run():
        c = c_ref[0]              # (G, n_pad)
        tau = tau_ref[0]          # (G, n_pad)
        b = b_ref[0]              # (G, T)
        sigma = sigma_ref[0]      # (G, T)

        def body(_, carry):
            xs, ys, sxs, sys_ = carry
            new_xs, new_ys, new_sx, new_sy = [], [], [], []
            for g in range(g_sz):
                a_g = a_ref[0, g]                     # (T, n_pad) VMEM
                x_g, y_g = xs[g], ys[g]               # (1, n), (1, T)
                aty = jax.lax.dot_general(
                    y_g.astype(a_dt), a_g, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                x_new = jnp.clip(
                    x_g - tau[g:g + 1] * (c[g:g + 1] + aty), 0.0, 1.0)
                ax = jax.lax.dot_general(
                    (2.0 * x_new - x_g).astype(a_dt), a_g,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                y_new = jnp.maximum(
                    0.0, y_g + sigma[g:g + 1] * (ax - b[g:g + 1]))
                new_xs.append(x_new)
                new_ys.append(y_new)
                if average:
                    new_sx.append(sxs[g] + x_new)
                    new_sy.append(sys_[g] + y_new)
            if not average:
                new_sx, new_sy = list(sxs), list(sys_)
            return (tuple(new_xs), tuple(new_ys), tuple(new_sx),
                    tuple(new_sy))

        xs0 = tuple(x_ref[0, g:g + 1, :] for g in range(g_sz))
        ys0 = tuple(y_ref[0, g:g + 1, :] for g in range(g_sz))
        zx0 = tuple(jnp.zeros_like(v) for v in xs0)
        zy0 = tuple(jnp.zeros_like(v) for v in ys0)
        xs, ys, sxs, sys_ = jax.lax.fori_loop(0, iters, body,
                                              (xs0, ys0, zx0, zy0))
        inv = 1.0 / float(iters)
        for g in range(g_sz):
            a_g, b_g, c_g = a_ref[0, g], b[g:g + 1], c[g:g + 1]
            v_last = lane_err(xs[g], ys[g], c_g, a_g, b_g)
            if average:
                # PDLP-style restart candidate: the chunk's ergodic average
                # often breaks the last-iterate oscillation plateau on
                # degenerate cut LPs. Keep whichever (x, y) pair scores
                # better on the combined (violation, gap) metric, per lane.
                x_avg = sxs[g] * inv
                y_avg = sys_[g] * inv
                v_avg = lane_err(x_avg, y_avg, c_g, a_g, b_g)
                take_avg = v_avg < v_last
                xo_ref[0, g:g + 1, :] = jnp.where(take_avg, x_avg, xs[g])
                yo_ref[0, g:g + 1, :] = jnp.where(take_avg, y_avg, ys[g])
                viol_ref[0, 0, g] = jnp.minimum(v_avg, v_last)
            else:
                xo_ref[0, g:g + 1, :] = xs[g]
                yo_ref[0, g:g + 1, :] = ys[g]
                viol_ref[0, 0, g] = v_last


@functools.partial(jax.jit,
                   static_argnames=("iters", "interpret", "max_group",
                                    "average"))
def pdhg_chunk_pallas(c, a, b, tau, sigma, x, y, *, iters: int,
                      active=None, interpret: bool = False,
                      max_group: int = 16, average: bool = False):
    """Run ``iters`` PDHG steps per lane with A VMEM-resident.

    c, tau, x: (B, n); a: (B, T, n); b, sigma, y: (B, T). T must be a
    multiple of 128; n is padded here. ``active``: optional (B,) bool —
    lane groups whose lanes are all inactive skip the chunk (their x/y pass
    through, viol reads 0). Returns (x', y', viol (B,)).
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

    # bf16 A storage on the real TPU (±1 cut rows are exact in bf16, and
    # the MXU rounds the f32 vector operand to bf16 at DEFAULT precision
    # regardless — bit-identical, half the VMEM, double the group size).
    # Interpreter mode keeps f32 so the CPU differential tests compare the
    # solvers in exact arithmetic.
    if not interpret:
        a = a.astype(jnp.bfloat16)
    g_sz = pick_group_size(bsz, t_rows, n_pad, max_group,
                           a_bytes=a.dtype.itemsize)
    n_grp = bsz // g_sz
    if active is None:
        act = jnp.ones((n_grp, 1, 1), jnp.int32)
    else:
        act = jnp.any(active.reshape(n_grp, g_sz), axis=1
                      ).astype(jnp.int32).reshape(n_grp, 1, 1)

    # group the lane axis: (B, ...) -> (B//G, G, ...); each grid program owns
    # one group. Vector blocks keep a full (G, X) trailing shape, so Mosaic's
    # block-dim rule (last two dims tile-aligned or full) is satisfied.
    c4, tau4, x4 = (v.reshape(n_grp, g_sz, n_pad) for v in (c, tau, x))
    b4, sigma4, y4 = (v.reshape(n_grp, g_sz, t_rows) for v in (b, sigma, y))
    a4 = a.reshape(n_grp, g_sz, t_rows, n_pad)

    grp3 = lambda i: (i, 0, 0)                    # noqa: E731
    grp4 = lambda i: (i, 0, 0, 0)                 # noqa: E731
    vec_n = pl.BlockSpec((1, g_sz, n_pad), grp3, memory_space=pltpu.VMEM)
    vec_t = pl.BlockSpec((1, g_sz, t_rows), grp3, memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((1, g_sz, t_rows, n_pad), grp4,
                       memory_space=pltpu.VMEM)
    act_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)

    xo, yo, viol = pl.pallas_call(
        functools.partial(_kernel, iters=iters, group=g_sz,
                          average=average),
        grid=(n_grp,),
        in_specs=[act_spec, vec_n, mat, vec_t, vec_n, vec_t, vec_n, vec_t],
        out_specs=[vec_n, vec_t,
                   pl.BlockSpec((1, 1, g_sz), lambda i: (i, 0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_grp, g_sz, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((n_grp, g_sz, t_rows), jnp.float32),
                   jax.ShapeDtypeStruct((n_grp, 1, g_sz), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * iters * bsz * t_rows * n_pad,
            bytes_accessed=4 * bsz * t_rows * n_pad,
            transcendentals=0),
        interpret=interpret,
    )(act, c4, a4, b4, tau4, sigma4, x4, y4)
    return (xo.reshape(bsz, n_pad)[:, :n], yo.reshape(bsz, t_rows),
            viol.reshape(bsz))
