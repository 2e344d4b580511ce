"""Prototype: VPU multiply-reduce batched GEMV vs the MXU dot variant.

Run: python scripts/prof/prof_gemv_vpu.py
"""
import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from ldpc_tpu.ops.pallas.gemv_kernel import batched_gemv, batched_gemv_t

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=128)
p.add_argument("--rows", type=int, default=1152)
p.add_argument("--npad", type=int, default=384)
p.add_argument("--group", type=int, default=4)
p.add_argument("--reps", type=int, default=60)
args = p.parse_args()
B, T, n, G, REPS = args.batch, args.rows, args.npad, args.group, args.reps
n_grp = B // G

rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(-1, 2, (B, T, n)).astype(np.float32))
a_bf = a.astype(jnp.bfloat16)
x0 = jnp.asarray(rng.uniform(size=(B, n)).astype(np.float32))
y0 = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))
f32 = jnp.float32


def fwd_vpu_kernel(a_ref, x_ref, o_ref, *, group):
    for g in range(group):
        a_g = a_ref[0, g].astype(f32)            # (T, n)
        x_g = x_ref[0, g]                        # (1, n) f32
        o_ref[0, g, :] = jnp.sum(a_g * x_g, axis=-1)


def tr_vpu_kernel(a_ref, y_ref, o_ref, *, group):
    for g in range(group):
        a_g = a_ref[0, g].astype(f32)            # (T, n)
        y_g = y_ref[0, g]                        # (1, T) f32
        o_ref[0, g, :] = jnp.sum(a_g * y_g[0][:, None], axis=0)


def call(kernel, v, v_last, out_last):
    a4 = a_bf.reshape(n_grp, G, T, n)
    v3 = v.reshape(n_grp, G, 1, v_last)
    return pl.pallas_call(
        functools.partial(kernel, group=G),
        grid=(n_grp,),
        in_specs=[pl.BlockSpec((1, G, T, n), lambda i: (i, 0, 0, 0),
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

y_v = call(fwd_vpu_kernel, x0, n, T)
z_v = call(tr_vpu_kernel, y0, T, n)
print("vpu fwd rel err",
      float(jnp.max(jnp.abs(y_v - y_ref))) / float(jnp.max(jnp.abs(y_ref))))
print("vpu tr  rel err",
      float(jnp.max(jnp.abs(z_v - z_ref))) / float(jnp.max(jnp.abs(z_ref))))


# benches map (B,n)->(B,n) by chaining fwd then tr so fori_loop types match
def pair_mxu(x):
    return batched_gemv_t(a_bf, batched_gemv(a_bf, x))


def pair_vpu(x):
    return call(tr_vpu_kernel, call(fwd_vpu_kernel, x, n, T), T, n)


for name, fn in (("mxu-split3 pair", pair_mxu), ("vpu-f32 pair", pair_vpu)):
    g = jax.jit(lambda v, fn=fn: jax.lax.fori_loop(
        0, REPS, lambda _, w: fn(w) * 1e-3, v))
    out = g(x0)
    np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    out = g(x0)
    np.asarray(out).ravel()[0]
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:18s}: {dt:.3f} ms per matvec pair "
          f"(~{2 * a_bf.nbytes / (dt * 1e-3) / 1e9:.0f} GB/s A-stream)")
