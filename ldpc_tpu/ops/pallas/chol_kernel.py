"""Batched blocked Cholesky for the IPM Newton step (TPU Pallas + XLA).

XLA's ``jnp.linalg.cholesky`` at the IPM's working size — (B, 280, 280),
B = 64 lanes — costs ~12.5 ms on v5e *independent of matmul precision*: its
lowering is bound by per-column sequential overhead, not flops
(``scripts/prof/prof_chol.py``). The same bound hits
``triangular_solve``. Since the factorization is ~80% of the AGC-ALP
Newton step (PERF.md), this module re-blocks it TPU-first:

* **panel updates** (the O(n^3) flops) run as ordinary XLA batched matmuls
  on the MXU — left-looking block-column updates;
* the genuinely sequential part — factoring an (nb, nb) diagonal block and
  inverting its triangle — runs in ONE Pallas kernel, vectorized across
  the batch on the *lane* dimension: the kernel works on (nb, nb, B)
  tensors, so every per-column/per-row recurrence step is a full-width VPU
  op over all lanes at once, and the whole block stays in VMEM;
* solves against the factor use the *inverted* diagonal blocks, turning
  ``cho_solve`` into P^2 tiny batched matvecs (no sequential triangular
  solve at all).

Semantics match ``jnp.linalg.cholesky`` + ``cho_solve`` to f32 rounding
(differential-tested in ``tests/test_chol.py``); non-SPD lanes produce
NaN in that lane only, preserving the IPM's NaN-freeze safeguard
(``ops/ipm_solver.py``).

Replaces the GLPK factor/solve core of the reference's exact-LP path
(``glp_simplex``, ``algo/agc_alp.h:94-101``) at the linear-algebra level.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["blocked_cholesky", "blocked_cho_solve", "CholFactors"]

HI = jax.lax.Precision.HIGHEST


def _diag_inv_kernel(m_ref, l_ref, v_ref, *, nb: int):
    """Factor one SPD diagonal block and invert its triangle, all lanes at
    once.

    Layouts (B on lanes):
      m_ref: (nb, nb, B)  symmetric input, m[k, i, b] = M[b][i, k]
      l_ref: (nb, nb, B)  output, l[k, i, b] = L[b][i, k]   (column-major)
      v_ref: (nb, nb, B)  output, v[i, k, b] = inv(L)[b][i, k] (row-major)

    Pass 1 (columns k): classic right-looking rank-1 recurrence. The full
    symmetric block is updated each step (rows/cols <= k are never read
    again, so no masking is needed on the update), which keeps row k equal
    to column k and lets the outer product be formed from two orthogonal
    slices of the SAME tensor — no in-kernel transposes:
        row  = m[k:k+1, :, :]   (1, nb, B)   sublane-oriented copy
        col  = m[:, k:k+1, :]   (nb, 1, B)   leading-oriented copy
        m   -= (col * r) * (row * r),   r = rsqrt(diag)
    Pass 2 (rows i): forward substitution for V = L^{-1}:
        V[i, :] = (e_i - sum_{j<i} L[i, j] V[j, :]) / L[i, i].
    """
    f32 = jnp.float32
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)

    def factor_step(k, _):
        row = m_ref[pl.ds(k, 1), :, :]                     # (1, nb, B)
        dkk = jnp.sum(jnp.where(iota_sub == k, row, 0.0),
                      axis=1, keepdims=True)               # (1, 1, B)
        r = jax.lax.rsqrt(dkk)
        lcol = row * r                                     # (1, nb, B)
        # L column k, zero above the diagonal
        l_ref[pl.ds(k, 1), :, :] = jnp.where(iota_sub >= k, lcol, 0.0)
        col = m_ref[:, pl.ds(k, 1), :]                     # (nb, 1, B)
        m_ref[:, :, :] = m_ref[:, :, :] - (col * r) * lcol
        return 0

    jax.lax.fori_loop(0, nb, factor_step, 0, unroll=False)

    # pass 2: V rows, using L in column-major layout (l[k, i, b] = L[i, k])
    iota_lead = jax.lax.broadcasted_iota(jnp.int32, (nb, 1, 1), 0)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
    # output VMEM is uninitialized — rows >= i must read as 0 in the
    # recurrence below (and 0 * garbage-NaN would poison the sum)
    v_ref[:, :, :] = jnp.zeros((nb, nb, v_ref.shape[-1]), f32)

    def inv_step(i, _):
        l_row = l_ref[:, pl.ds(i, 1), :]                   # (nb_j, 1, B)
        lii = jnp.sum(jnp.where(iota_lead == i, l_row, 0.0),
                      axis=0, keepdims=True)               # (1, 1, B)
        inv_lii = 1.0 / lii
        # sum_{j<i} L[i, j] * V[j, :] — j on the leading axis of both
        prod = jnp.where(iota_lead < i, l_row * v_ref[:, :, :], 0.0)
        s = jnp.sum(prod, axis=0, keepdims=True)           # (1, nb, B)
        row = jnp.where(iota_k == i, inv_lii,
                        -s * inv_lii).astype(f32)
        v_ref[pl.ds(i, 1), :, :] = jnp.where(iota_k <= i, row, 0.0)
        return 0

    jax.lax.fori_loop(0, nb, inv_step, 0, unroll=False)


def _chol_diag_inv(d, nb: int, interpret: bool = False):
    """(B, nb, nb) SPD blocks -> (L (B, nb, nb), invL (B, nb, nb))."""
    bsz = d.shape[0]
    dt = jnp.transpose(d, (2, 1, 0))        # (k, i, B): column-major lanes=B
    kern = functools.partial(_diag_inv_kernel, nb=nb)
    l_t, v_t = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((nb, nb, bsz), jnp.float32),
                   jax.ShapeDtypeStruct((nb, nb, bsz), jnp.float32)),
        in_specs=[pl.BlockSpec((nb, nb, bsz), lambda: (0, 0, 0))],
        out_specs=(pl.BlockSpec((nb, nb, bsz), lambda: (0, 0, 0)),
                   pl.BlockSpec((nb, nb, bsz), lambda: (0, 0, 0))),
        interpret=interpret,
    )(dt.astype(jnp.float32))
    # l_t[k, i, b] = L[i, k] -> (B, i, k); v_t[i, k, b] = V[i, k] -> (B, i, k)
    return jnp.transpose(l_t, (2, 1, 0)), jnp.transpose(v_t, (2, 0, 1))


@dataclass
class CholFactors:
    """Blocked factorization of SPD M = L L^T.

    ``l``: (B, n_pad, n_pad) lower-triangular factor (dense, padded);
    ``inv_diag``: (P, B, nb, nb) inverted diagonal blocks of L;
    ``nb``/``n``: block size and original (unpadded) dimension.
    """
    l: jnp.ndarray
    inv_diag: jnp.ndarray
    nb: int
    n: int


def blocked_cholesky(m, nb: int = 64, interpret: bool = False
                     ) -> CholFactors:
    """Batched blocked Cholesky of SPD ``m`` (B, n, n) -> CholFactors.

    Left-looking by block column; flops on the MXU, the sequential diagonal
    factor+inverse in the Pallas kernel above. Padding (identity diagonal)
    makes every block full-size.
    """
    bsz, n, _ = m.shape
    p_cnt = -(-n // nb)
    n_pad = p_cnt * nb
    m = m.astype(jnp.float32)
    if n_pad != n:
        pad = n_pad - n
        m = jnp.pad(m, ((0, 0), (0, pad), (0, pad)))
        eye_tail = (jnp.arange(n_pad) >= n).astype(jnp.float32)
        m = m + jnp.diag(eye_tail)[None]

    cols = []          # L block-columns, each (B, n_pad - q*nb, nb)
    inv_diags = []
    for q in range(p_cnt):
        qs = q * nb
        acc = jax.lax.slice(m, (0, qs, qs), (bsz, n_pad, qs + nb))
        for t in range(q):
            lt = cols[t]
            off = qs - t * nb
            a_blk = jax.lax.slice(lt, (0, off, 0),
                                  (bsz, lt.shape[1], nb))  # rows >= q
            b_blk = jax.lax.slice(lt, (0, off, 0), (bsz, off + nb, nb))
            acc = acc - jnp.einsum("brk,bsk->brs", a_blk, b_blk,
                                   preferred_element_type=jnp.float32,
                                   precision=HI)
        d_blk = jax.lax.slice(acc, (0, 0, 0), (bsz, nb, nb))
        l_d, v_d = _chol_diag_inv(d_blk, nb, interpret=interpret)
        inv_diags.append(v_d)
        if q + 1 < p_cnt:
            below = jax.lax.slice(acc, (0, nb, 0), (bsz, acc.shape[1], nb))
            l_below = jnp.einsum("brk,bsk->brs", below, v_d,
                                 preferred_element_type=jnp.float32,
                                 precision=HI)
            cols.append(jnp.concatenate([l_d, l_below], axis=1))
        else:
            cols.append(l_d)

    l_full = jnp.zeros((bsz, n_pad, n_pad), jnp.float32)
    for q, lc in enumerate(cols):
        l_full = jax.lax.dynamic_update_slice(
            l_full, lc, (0, q * nb, q * nb))
    return CholFactors(l=l_full, inv_diag=jnp.stack(inv_diags), nb=nb, n=n)


def blocked_cho_solve(fac: CholFactors, r):
    """Solve M x = r for each lane given ``blocked_cholesky`` factors.

    r: (B, n) -> x: (B, n). Forward then backward block substitution; every
    step is a (B, nb, nb) x (B, nb) matvec against L blocks or the
    pre-inverted diagonal blocks — no sequential triangular solves.
    """
    nb, n = fac.nb, fac.n
    bsz = r.shape[0]
    p_cnt = fac.l.shape[1] // nb
    r = r.astype(jnp.float32)
    if p_cnt * nb != n:
        r = jnp.pad(r, ((0, 0), (0, p_cnt * nb - n)))

    def mv(a, v):
        return jnp.einsum("bij,bj->bi", a, v,
                          preferred_element_type=jnp.float32, precision=HI)

    def blk(i, j):
        return jax.lax.slice(fac.l, (0, i * nb, j * nb),
                             (bsz, (i + 1) * nb, (j + 1) * nb))

    # forward: L z = r
    z = []
    for q in range(p_cnt):
        acc = jax.lax.slice(r, (0, q * nb), (bsz, (q + 1) * nb))
        for t in range(q):
            acc = acc - mv(blk(q, t), z[t])
        z.append(mv(fac.inv_diag[q], acc))
    # backward: L^T x = z
    x = [None] * p_cnt
    for q in range(p_cnt - 1, -1, -1):
        acc = z[q]
        for t in range(q + 1, p_cnt):
            acc = acc - jnp.einsum("bij,bi->bj", blk(t, q), x[t],
                                   preferred_element_type=jnp.float32,
                                   precision=HI)
        x[q] = jnp.einsum("bij,bi->bj", fac.inv_diag[q], acc,
                          preferred_element_type=jnp.float32, precision=HI)
    out = jnp.concatenate(x, axis=1)
    return out[:, :n]
