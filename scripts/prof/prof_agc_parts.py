"""Time AGC-ALP components: gauss elimination and large-tier PDHG chunks."""
import time
import numpy as np
import jax, jax.numpy as jnp

from ldpc_tpu.codes.io import read_pcm
from ldpc_tpu.ops.gf2_gauss import calculate_gauss_batched
from ldpc_tpu.ops.lp_solver import pdhg_steps
from ldpc_tpu.ops.pallas.pdhg_kernel import pdhg_chunk_pallas, pick_group_size

B = 64
h = read_pcm("data/optimalH.txt")
hj = jnp.asarray(h)
rng = np.random.default_rng(0)
u = jnp.asarray(rng.uniform(size=(B, h.shape[1])).astype(np.float32))

f = jax.jit(lambda u: calculate_gauss_batched(hj, u, 1e-3))
r = f(u); jax.block_until_ready(r)
t0 = time.time()
for _ in range(10):
    r = f(u); jax.block_until_ready(r)
print(f"gauss B={B}: {(time.time()-t0)/10*1e3:.1f} ms/call")

n = 280
for T in (768, 1024, 1280):
    a = jnp.asarray(rng.integers(-1, 2, (B, T, n)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
    b = jnp.asarray((np.abs(rng.normal(size=(B, T))) * 2).astype(np.float32))
    x = jnp.asarray(rng.uniform(size=(B, n)).astype(np.float32))
    y = jnp.zeros((B, T), jnp.float32)
    tau, sigma = pdhg_steps(a)
    g = pick_group_size(B, T, 384)
    out = pdhg_chunk_pallas(c, a, b, tau, sigma, x, y, iters=600)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = pdhg_chunk_pallas(c, a, b, tau, sigma, x, y, iters=600)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / 5
    print(f"T={T} G={g}: {dt*1e3:.1f} ms per 600-iter chunk (B={B})")
