"""Round-5b Newton-step part costs at the production shape, rep-looped so
the ~27 ms tunnel RTT amortizes (the round-5 standalone numbers were
RTT-polluted).

Run: python scripts/prof/prof_newton_parts2.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from ldpc_tpu.ops.pallas.chol_kernel import blocked_cho_solve, blocked_cholesky
from ldpc_tpu.ops.pallas.gemv_kernel import (batched_gemv, batched_gemv_t,
                                             prepare_gemv)

B, T, n, REPS = 128, 1152, 280, 40
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(-1, 2, (B, T, n)).astype(np.float32))
at = prepare_gemv(a)
d = jnp.asarray(np.abs(rng.normal(size=(B, T))).astype(np.float32) + 0.1)
dx = jnp.asarray(np.abs(rng.normal(size=(B, n))).astype(np.float32) + 0.1)
r = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
x0 = jnp.asarray(rng.uniform(size=(B, n)).astype(np.float32))
eye = jnp.eye(n, dtype=jnp.float32)
f32 = jnp.float32
HI = jax.lax.Precision.HIGHEST


def build(dd):
    m = jnp.einsum("bri,br,brj->bij", a, dd, a,
                   preferred_element_type=f32, precision=HI)
    return m + jax.vmap(jnp.diag)(dx) + 1e-6 * eye[None]


m0 = jax.jit(build)(d)
fac0 = blocked_cholesky(m0)


def bench(name, fn, arg):
    g = jax.jit(lambda v, fn=fn: jax.lax.fori_loop(
        0, REPS, lambda _, w: fn(w), v))
    out = g(arg)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    out = g(arg)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:28s}: {dt:.3f} ms")
    return dt


def dep(v, out):
    """carry-type-preserving data dependency on ``out``"""
    if hasattr(out, "l"):
        out = (out.l, out.inv_diag)
    leaves = jax.tree.leaves(out)
    s = sum(jnp.sum(l[(0,) * l.ndim]).astype(jnp.float32) for l in leaves)
    return v + s * 1e-30


bench("normal build (HIGHEST)", lambda dd: dep(dd, build(dd)), d)
bench("blocked_cholesky", lambda m: dep(m, blocked_cholesky(m)), m0)
bench("blocked_cho_solve", lambda rr: blocked_cho_solve(fac0, rr) * 0.5, r)
bench("gemv fwd (pallas)", lambda x: batched_gemv(at, x)[:, :n] * 1e-3, x0)
bench("gemv pair (pallas)",
      lambda x: batched_gemv_t(at, batched_gemv(at, x), n) * 1e-3, x0)
bench("einsum pair (HIGHEST)",
      lambda x: jnp.einsum(
          "brn,br->bn", a,
          jnp.einsum("brn,bn->br", a, x, preferred_element_type=f32,
                     precision=HI),
          preferred_element_type=f32, precision=HI) * 1e-3, x0)
