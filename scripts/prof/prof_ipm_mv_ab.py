"""A/B: ipm_box_lp with XLA-einsum vs Pallas-GEMV matvecs — cost and
convergence on warm-started synthetic cut systems (fetch-synced, rep-looped
so the tunnel RTT amortizes)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from ldpc_tpu.ops.ipm_solver import ipm_box_lp

B, n, REPS = 128, 280, 5
rng = np.random.default_rng(0)
for T in (640, 1152):
    a = jnp.asarray(rng.integers(-1, 2, (B, T, n)).astype(np.float32))
    b = jnp.asarray((np.abs(rng.normal(size=(B, T))) * 3).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
    x0 = jnp.asarray(rng.uniform(0.1, 0.9, (B, n)).astype(np.float32))
    y0 = jnp.abs(jnp.asarray(rng.normal(size=(B, T)).astype(np.float32)))
    for backend in ("xla", "pallas"):
        for iters in (20, 40):
            def solve(cc, aa, bb, xx, yy, it=iters, be=backend):
                x, y, e = ipm_box_lp(cc, aa, bb, iters=it, tol=1e-5,
                                     x0=xx, y0=yy, matvec_backend=be)
                return x, e
            g = jax.jit(lambda cc, aa, bb, xx, yy, s=solve: s(cc, aa, bb,
                                                              xx, yy))
            out = g(c, a, b, x0, y0)
            np.asarray(out[1]).ravel()[0]
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = g(c, a, b, x0, y0)
            err = np.asarray(out[1])
            dt = (time.perf_counter() - t0) / REPS
            xs = np.asarray(out[0])
            print(f"T={T} {backend:7s} iters={iters}: {dt * 1e3:6.0f} ms  "
                  f"max_err {err.max():.2e}  med_err {np.median(err):.2e} "
                  f" x[0,:3]={np.round(xs[0, :3], 5)}")
