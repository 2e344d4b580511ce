"""A-matvec cost: HIGHEST f32 vs bf16x2 split (in-loop, fetch-synced)."""
import time, jax, jax.numpy as jnp, numpy as np
B, T, n, REPS = 64, 1024, 280, 60
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(-1, 2, (B, T, n)).astype(np.float32))
a_bf = a.astype(jnp.bfloat16)
x0 = jnp.asarray(rng.uniform(size=(B, n)).astype(np.float32))
f32 = jnp.float32
HI = jax.lax.Precision.HIGHEST

def pair_hi(x):
    y = jnp.einsum("brn,bn->br", a, x, preferred_element_type=f32, precision=HI)
    return jnp.einsum("brn,br->bn", a, y, preferred_element_type=f32, precision=HI)

def pair_bf2(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(f32)).astype(jnp.bfloat16)
    y = (jnp.einsum("brn,bn->br", a_bf, hi, preferred_element_type=f32)
         + jnp.einsum("brn,bn->br", a_bf, lo, preferred_element_type=f32))
    yh = y.astype(jnp.bfloat16); yl = (y - yh.astype(f32)).astype(jnp.bfloat16)
    return (jnp.einsum("brn,br->bn", a_bf, yh, preferred_element_type=f32)
            + jnp.einsum("brn,br->bn", a_bf, yl, preferred_element_type=f32))

for name, fn in (("highest-f32", pair_hi), ("bf16x2", pair_bf2)):
    g = jax.jit(lambda x, fn=fn: jax.lax.fori_loop(
        0, REPS, lambda _, v: fn(v) * 1e-3, x))
    out = g(x0); np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    out = g(x0); np.asarray(out).ravel()[0]
    print(f"{name:12s}: {(time.perf_counter()-t0)/REPS*1e3:.2f} ms per matvec pair")
err = np.abs(np.asarray(pair_hi(x0)) - np.asarray(pair_bf2(x0)))
scale = np.abs(np.asarray(pair_hi(x0))).max()
print("bf16x2 max abs err:", err.max(), "rel:", err.max()/scale)
