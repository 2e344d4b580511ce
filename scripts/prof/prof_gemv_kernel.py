"""Microbench + accuracy check: Pallas bf16 batched GEMV vs HIGHEST einsum.

Run: PYTHONPATH=/root/.axon_site:. python scripts/prof/prof_gemv_kernel.py
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from ldpc_tpu.ops.pallas.gemv_kernel import (batched_gemv, batched_gemv_t,
                                             gemv_pair_ref)

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=128)
p.add_argument("--rows", type=int, default=1152)
p.add_argument("--npad", type=int, default=384)
p.add_argument("--reps", type=int, default=60)
args = p.parse_args()
B, T, n, REPS = args.batch, args.rows, args.npad, args.reps

rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(-1, 2, (B, T, n)).astype(np.float32))
a_bf = a.astype(jnp.bfloat16)
x0 = jnp.asarray(rng.uniform(size=(B, n)).astype(np.float32))

# accuracy: pair through the kernel vs pair through HIGHEST einsums
y_ref, z_ref = gemv_pair_ref(a, x0)
y_k = batched_gemv(a_bf, x0)
z_k = batched_gemv_t(a_bf, y_k)
ey = np.abs(np.asarray(y_k, np.float64) - np.asarray(y_ref, np.float64))
ez = np.abs(np.asarray(z_k, np.float64) - np.asarray(z_ref, np.float64))
print(f"fwd rel err {ey.max() / np.abs(np.asarray(y_ref)).max():.2e}  "
      f"tr rel err {ez.max() / np.abs(np.asarray(z_ref)).max():.2e}")


def pair_hi(x):
    y, z = gemv_pair_ref(a, x)
    return z


def pair_pallas(x):
    return batched_gemv_t(a_bf, batched_gemv(a_bf, x))


for name, fn in (("highest-einsum", pair_hi), ("pallas-bf16", pair_pallas)):
    g = jax.jit(lambda x, fn=fn: jax.lax.fori_loop(
        0, REPS, lambda _, v: fn(v) * 1e-3, x))
    out = g(x0)
    np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    out = g(x0)
    np.asarray(out).ravel()[0]
    dt = (time.perf_counter() - t0) / REPS * 1e3
    gbps = 2 * a_bf.nbytes / (dt * 1e-3) / 1e9 if name == "pallas-bf16" \
        else 2 * a.nbytes / (dt * 1e-3) / 1e9
    print(f"{name:15s}: {dt:.3f} ms per matvec pair  (~{gbps:.0f} GB/s A-stream)")
