"""Trustworthy timing on the axon tunnel: block_until_ready is a NO-OP
there, so every measurement must end in a host fetch; RTT (~23ms) is
measured and subtracted. Each measured fn returns a scalar."""
import time
import numpy as np
import jax, jax.numpy as jnp

from ldpc_tpu.codes.io import read_pcm
from ldpc_tpu.ops.gf2_gauss import calculate_gauss_batched
from ldpc_tpu.ops.lp_solver import pdhg_steps
from ldpc_tpu.ops.pallas.pdhg_kernel import pdhg_chunk_pallas, pick_group_size

# measure RTT with a trivial program
triv = jax.jit(lambda x: x + 1.0)
z = jnp.float32(0.0)
_ = float(triv(z))
t0 = time.time()
reps = 20
for _ in range(reps):
    _ = float(triv(z))
RTT = (time.time() - t0) / reps
print(f"RTT (trivial jit + scalar fetch): {RTT*1e3:.2f} ms")


def bench(name, fn, *args, reps=5):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    _ = float(f(*args))
    t0 = time.time()
    for _ in range(reps):
        _ = float(f(*args))
    dt = (time.time() - t0) / reps - RTT
    print(f"{name}: {dt*1e3:.2f} ms (+{RTT*1e3:.0f} RTT)")
    return dt


B = 64
h = read_pcm("data/optimalH.txt")
hj = jnp.asarray(h)
rng = np.random.default_rng(0)
u = jnp.asarray(rng.uniform(size=(B, h.shape[1])).astype(np.float32))

bench("gauss xla", lambda u: calculate_gauss_batched(hj, u, 1e-3,
                                                     backend="xla"), u)
bench("gauss pallas", lambda u: calculate_gauss_batched(hj, u, 1e-3,
                                                        backend="pallas"), u)
act2 = jnp.arange(B) < 8
bench("gauss pallas 1-of-8 groups",
      lambda u: calculate_gauss_batched(hj, u, 1e-3, active=act2,
                                        backend="pallas"), u)

n = 280
for T in (256, 768, 1280):
    a = jnp.asarray(rng.integers(-1, 2, (B, T, n)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
    b = jnp.asarray((np.abs(rng.normal(size=(B, T))) * 2).astype(np.float32))
    x = jnp.asarray(rng.uniform(size=(B, n)).astype(np.float32))
    y = jnp.zeros((B, T), jnp.float32)
    tau, sigma = pdhg_steps(a)
    g = pick_group_size(B, T, 384)
    bench(f"pdhg chunk T={T} G={g} 600it",
          lambda c, a, b, tau, sigma, x, y: pdhg_chunk_pallas(
              c, a, b, tau, sigma, x, y, iters=600)[0],
          c, a, b, tau, sigma, x, y)
