"""Capture stalled ALP cut-LP instances and experiment with PDHG variants."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ldpc_tpu.codes.io import read_pcm
from ldpc_tpu.codes.gf2 import gf2_nullspace
from ldpc_tpu.channel.awgn import gen_random_codewords, channel_llr
from ldpc_tpu.decoders.alp import ALPDecoder
from ldpc_tpu.ops.lp_solver import pdhg_steps

B = 64
h = read_pcm("data/optimalH.txt")
g, ok = gf2_nullspace(h)
key = jax.random.key(239_239_239)
cw = np.asarray(gen_random_codewords(jax.random.fold_in(key, 1), g, B))
_, llrs = channel_llr(jax.random.fold_in(key, 2), jnp.asarray(cw), -3.0)

dec = ALPDecoder(h, max_rounds=20)
st = jax.jit(dec._run_loop)(llrs)
rnd, x, y, a_buf, rhs_buf, count, done, viol, _ = map(np.asarray, st)
print(f"captured after rounds={int(rnd)}: viol p50={np.percentile(viol,50):.1e}"
      f" max={viol.max():.1e} count p50={np.percentile(count,50):.0f}")

# keep the worst 8 lanes, slice to T=384 rows
idx = np.argsort(-viol)[:8]
T = 384
c = np.asarray(llrs, np.float32)
if dec.perturb:
    scale = np.mean(np.abs(c), axis=1, keepdims=True)
    c = c + dec.perturb * scale * np.asarray(dec._pert_dir)[None]
a = jnp.asarray(a_buf[idx, :T]); b = jnp.asarray(rhs_buf[idx, :T])
cc = jnp.asarray(c[idx]); xx = jnp.asarray(x[idx]); yy = jnp.asarray(y[idx, :T])
tau, sigma = pdhg_steps(a)


def run_variant(name, step_fn, iters, period=0, avg_restart=False,
                x0=None, y0=None):
    x0 = xx if x0 is None else x0
    y0 = yy if y0 is None else y0

    @jax.jit
    def solve(x0, y0):
        def inner(x, y, n):
            def body(_, s):
                x, y, sx, sy = s
                xn, yn = step_fn(x, y)
                return xn, yn, sx + xn, sy + yn
            x, y, sx, sy = jax.lax.fori_loop(
                0, n, body, (x, y, jnp.zeros_like(x), jnp.zeros_like(y)))
            if avg_restart:
                return sx / n, sy / n
            return x, y
        if period:
            def outer(_, s):
                return inner(*s, period)
            return jax.lax.fori_loop(0, iters // period, outer, (x0, y0))
        return inner(x0, y0, iters)

    x1, y1 = solve(x0, y0)
    ax = jnp.einsum("brn,bn->br", a, x1)
    v = jnp.max(jnp.maximum(ax - b, 0.0), axis=1)
    obj = jnp.sum(cc * x1, axis=1)
    print(f"{name:34s} viol max={float(jnp.max(v)):.2e} "
          f"p50={float(jnp.median(v)):.2e} obj0={float(obj[0]):+.4f}")
    return x1, y1


def plain_step(x, y):
    aty = jnp.einsum("brn,br->bn", a, y, preferred_element_type=jnp.float32)
    xn = jnp.clip(x - tau * (cc + aty), 0.0, 1.0)
    ax = jnp.einsum("brn,bn->br", a, 2.0 * xn - x,
                    preferred_element_type=jnp.float32)
    yn = jnp.maximum(0.0, y + sigma * (ax - b))
    return xn, yn


run_variant("plain PDHG 4800it", plain_step, 4800)
run_variant("plain PDHG 20000it", plain_step, 20000)
run_variant("avg-restart PDHG 4800it p=600", plain_step, 4800,
            period=600, avg_restart=True)
run_variant("avg-restart PDHG 20000it p=600", plain_step, 20000,
            period=600, avg_restart=True)
