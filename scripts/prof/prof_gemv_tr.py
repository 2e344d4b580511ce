"""Prototype: transposed-layout (n-on-sublanes, T-on-lanes) VPU GEMV.

A stored as (B, n, T) bf16 — n=280 is 35 exact sublanes, T a lane multiple:
zero padding, in-register f32 upconvert, sublane reduce for A x and lane
reduce for A^T y.

Run: python scripts/prof/prof_gemv_tr.py
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=128)
p.add_argument("--rows", type=int, default=1152)
p.add_argument("--n", type=int, default=280)
p.add_argument("--group", type=int, default=4)
p.add_argument("--reps", type=int, default=60)
args = p.parse_args()
B, T, n, G, REPS = args.batch, args.rows, args.n, args.group, args.reps
n_grp = B // G

rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(-1, 2, (B, T, n)).astype(np.float32))
at_bf = jnp.transpose(a, (0, 2, 1)).astype(jnp.bfloat16)   # (B, n, T)
x0 = jnp.asarray(rng.uniform(size=(B, n)).astype(np.float32))
y0 = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))
f32 = jnp.float32


def fwd_kernel(a_ref, x_ref, o_ref, *, group):
    # a: (1, G, n, T); x: (1, G, 1, n) -> o: (1, G, T);  y_t = sum_n A_t[n,t] x[n]
    for g in range(group):
        a_g = a_ref[0, g].astype(f32)            # (n, T)
        x_g = x_ref[0, g, 0]                     # (n,)
        o_ref[0, g, :] = jnp.sum(a_g * x_g[:, None], axis=0)


def tr_kernel(a_ref, y_ref, o_ref, *, group):
    # a: (1, G, n, T); y: (1, G, 1, T) -> o: (1, G, n); z_n = sum_t A_t[n,t] y[t]
    for g in range(group):
        a_g = a_ref[0, g].astype(f32)            # (n, T)
        y_g = y_ref[0, g]                        # (1, T)
        o_ref[0, g, :] = jnp.sum(a_g * y_g, axis=1)


def call(kernel, v, v_last, out_last):
    a4 = at_bf.reshape(n_grp, G, n, T)
    v3 = v.reshape(n_grp, G, 1, v_last)
    return pl.pallas_call(
        functools.partial(kernel, group=G),
        grid=(n_grp,),
        in_specs=[pl.BlockSpec((1, G, n, T), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, G, 1, v_last), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, G, out_last), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_grp, G, out_last), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(a4, v3).reshape(B, out_last)


y_ref = jnp.einsum("brn,bn->br", a, x0,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=f32)
z_ref = jnp.einsum("brn,br->bn", a, y0,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=f32)
y_v = call(fwd_kernel, x0, n, T)
z_v = call(tr_kernel, y0, T, n)
print("fwd rel err",
      float(jnp.max(jnp.abs(y_v - y_ref))) / float(jnp.max(jnp.abs(y_ref))))
print("tr  rel err",
      float(jnp.max(jnp.abs(z_v - z_ref))) / float(jnp.max(jnp.abs(z_ref))))


def pair_vpu(x):
    return call(tr_kernel, call(fwd_kernel, x, n, T), T, n)


def pair_einsum(x):
    y = jnp.einsum("brn,bn->br", a, x,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=f32)
    return jnp.einsum("brn,br->bn", a, y,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=f32)


for name, fn in (("einsum-highest", pair_einsum), ("vpu-transposed", pair_vpu)):
    g = jax.jit(lambda v, fn=fn: jax.lax.fori_loop(
        0, REPS, lambda _, w: fn(w) * 1e-3, v))
    out = g(x0)
    np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    out = g(x0)
    np.asarray(out).ravel()[0]
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:15s}: {dt:.3f} ms per matvec pair "
          f"(~{2 * at_bf.nbytes / (dt * 1e-3) / 1e9:.0f} GB/s A-stream)")
