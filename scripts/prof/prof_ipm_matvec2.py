"""A-matvec cost, round-5b: can the IPM's 6-per-step GEMV pairs run below
the HIGHEST-f32 floor without losing the accuracy the Newton systems need?

Variants (production shape B=128, T=1152, n=280, cut rows are +-1-valued):
  * highest-f32 — the shipping configuration (6 bf16 passes per operand
    pair; exact-for-A terms with A_lo=0 are computed anyway).
  * high-f32    — 3 passes; with A exactly bf16 (A_lo = 0) this equals a
    bf16x2 split of the vector operand: ~2^-17 relative accuracy.
  * default-f32 — 1 pass (~bf16, 2^-8): known to stall the IPM at ~1e-2
    (ops/ipm_solver.py docstring); timed here only as the floor.
  * bf16-stack2 — A stored bf16, vector split hi/lo STACKED into one
    (B, 2, n) operand so both passes ride ONE einsum (one A stream from
    HBM — the round-5 null result used two separate einsums and paid the
    stream twice).

Run: python scripts/prof/prof_ipm_matvec2.py [--batch 128 --rows 1152]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=128)
p.add_argument("--rows", type=int, default=1152)
p.add_argument("--reps", type=int, default=60)
args = p.parse_args()
B, T, n, REPS = args.batch, args.rows, 280, args.reps

rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(-1, 2, (B, T, n)).astype(np.float32))
a_bf = a.astype(jnp.bfloat16)
x0 = jnp.asarray(rng.uniform(size=(B, n)).astype(np.float32))
f32 = jnp.float32


def make_pair(prec):
    def pair(x):
        y = jnp.einsum("brn,bn->br", a, x, preferred_element_type=f32,
                       precision=prec)
        return jnp.einsum("brn,br->bn", a, y, preferred_element_type=f32,
                          precision=prec)
    return pair


def pair_stack2(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(f32)).astype(jnp.bfloat16)
    x2 = jnp.stack([hi, lo], axis=1)                      # (B, 2, n)
    y = jnp.einsum("brn,bkn->bkr", a_bf, x2,
                   preferred_element_type=f32).sum(axis=1)  # (B, T)
    yh = y.astype(jnp.bfloat16)
    yl = (y - yh.astype(f32)).astype(jnp.bfloat16)
    y2 = jnp.stack([yh, yl], axis=1)                      # (B, 2, T)
    return jnp.einsum("brn,bkr->bkn", a_bf, y2,
                      preferred_element_type=f32).sum(axis=1)


variants = [
    ("highest-f32", make_pair(jax.lax.Precision.HIGHEST)),
    ("high-f32", make_pair(jax.lax.Precision.HIGH)),
    ("default-f32", make_pair(jax.lax.Precision.DEFAULT)),
    ("bf16-stack2", pair_stack2),
]

ref = np.asarray(variants[0][1](x0), np.float64)
scale = np.abs(ref).max()
for name, fn in variants:
    g = jax.jit(lambda x, fn=fn: jax.lax.fori_loop(
        0, REPS, lambda _, v: fn(v) * 1e-3, x))
    out = g(x0)
    np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    out = g(x0)
    np.asarray(out).ravel()[0]
    dt = (time.perf_counter() - t0) / REPS * 1e3
    err = np.abs(np.asarray(fn(x0), np.float64) - ref).max() / scale
    print(f"{name:12s}: {dt:.3f} ms per matvec pair  "
          f"(rel err vs HIGHEST {err:.2e})")
