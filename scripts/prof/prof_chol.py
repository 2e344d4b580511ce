"""Batched Cholesky cost on TPU vs precision / size / batch (in-loop,
fetch-synced). Informs the Pallas-vs-XLA decision for the IPM Newton step.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 40
rng = np.random.default_rng(0)


def bench(B, n, precision):
    a = rng.normal(size=(B, n, n)).astype(np.float32)
    m = jnp.asarray(np.einsum("bij,bkj->bik", a, a) / n
                    + 3.0 * np.eye(n, dtype=np.float32))

    def run(mm):
        def body(_, x):
            return jnp.linalg.cholesky(mm + x[0, 0, 0] * 1e-9)
        return jax.lax.fori_loop(0, REPS, body, mm * 0 + mm)

    with jax.default_matmul_precision(precision):
        f = jax.jit(run)
        out = f(m)
        np.asarray(out).ravel()[0]
        t0 = time.perf_counter()
        out = f(m)
        np.asarray(out).ravel()[0]
        dt = (time.perf_counter() - t0) / REPS
    print(f"cholesky B={B:4d} n={n:4d} prec={precision:8s}: "
          f"{dt * 1e3:7.2f} ms")
    return dt


for prec in ("highest", "default"):
    for B, n in ((64, 280), (64, 384), (64, 128), (128, 128), (128, 280)):
        bench(B, n, prec)

# triangular solve with many rhs (the blocked-solve building block)
for prec in ("highest", "default"):
    B, n, k = 64, 128, 256
    a = rng.normal(size=(B, n, n)).astype(np.float32)
    m = jnp.asarray(np.einsum("bij,bkj->bik", a, a) / n
                    + 3.0 * np.eye(n, dtype=np.float32))
    l = jax.jit(jnp.linalg.cholesky)(m)
    r = jnp.asarray(rng.normal(size=(B, k, n)).astype(np.float32))

    def run(rr):
        def body(_, x):
            return jax.lax.linalg.triangular_solve(
                l, x + rr * 1e-9, left_side=False, lower=True,
                transpose_a=True)
        return jax.lax.fori_loop(0, REPS, body, rr)

    with jax.default_matmul_precision(prec):
        f = jax.jit(run)
        out = f(r); np.asarray(out).ravel()[0]
        t0 = time.perf_counter()
        out = f(r); np.asarray(out).ravel()[0]
        print(f"trisolve B={B} n={n} rhs={k} prec={prec:8s}: "
              f"{(time.perf_counter() - t0) / REPS * 1e3:7.2f} ms")


# blocked (Pallas diag + MXU panels) factor+solve vs XLA, in-loop
def bench_blocked(B, n):
    import jax.tree_util as jtu
    from ldpc_tpu.ops.pallas.chol_kernel import (blocked_cho_solve,
                                                 blocked_cholesky)
    a = rng.normal(size=(B, n, n)).astype(np.float32)
    m = jnp.asarray(np.einsum("bij,bkj->bik", a, a) / n
                    + 3.0 * np.eye(n, dtype=np.float32))
    r = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))

    def run_factor(mm):
        def body(_, x):
            fac = blocked_cholesky(mm + x * 1e-9)
            return fac.l[:, :mm.shape[1], :mm.shape[2]]
        return jax.lax.fori_loop(0, REPS, body, mm * 0)

    def run_both(mm):
        def body(_, x):
            fac = blocked_cholesky(mm + x[0] * 1e-9)
            return blocked_cho_solve(fac, r + x * 1e-9)
        return jax.lax.fori_loop(0, REPS, body, r)

    with jax.default_matmul_precision("highest"):
        for name, f, arg in (("factor", run_factor, m),
                             ("factor+solve", run_both, m)):
            g = jax.jit(f)
            out = g(arg); np.asarray(out).ravel()[0]
            t0 = time.perf_counter()
            out = g(arg); np.asarray(out).ravel()[0]
            print(f"blocked {name:13s} B={B} n={n}: "
                  f"{(time.perf_counter() - t0) / REPS * 1e3:7.2f} ms")


if __name__ == "__main__":
    import sys
    if "--blocked" in sys.argv:
        for B, n in ((64, 280), (128, 280)):
            bench_blocked(B, n)
