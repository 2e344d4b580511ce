"""In-loop Newton-step op costs: run each op 40x inside one fori_loop with a
data dependency (so XLA can't DCE or overlap across the timed region) and
fetch once. Per-dispatch tunnel overhead amortizes to zero; this is the
honest per-op cost inside the IPM loop.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, T, n, REPS = 64, 1024, 280, 40
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(-1, 2, (B, T, n)).astype(np.float32))
d = jnp.asarray(np.abs(rng.normal(size=(B, T))).astype(np.float32)) + 0.1
dx = jnp.asarray(np.abs(rng.normal(size=(B, n))).astype(np.float32)) + 0.1
r0 = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
eye = jnp.eye(n, dtype=jnp.float32)
HI = jax.lax.Precision.HIGHEST


def build(dv):
    m = jnp.einsum("bri,br,brj->bij", a, d + dv[:, :1] * 0, a,
                   preferred_element_type=jnp.float32, precision=HI)
    return m + jax.vmap(jnp.diag)(dx) + 1e-6 * eye[None]


m0 = jax.jit(build)(d)
m0 = m0 + 300.0 * eye[None]      # make it well-conditioned SPD
chol0 = jax.jit(jnp.linalg.cholesky)(m0)


def loop(fn, init):
    def body(_, x):
        return fn(x)
    return jax.lax.fori_loop(0, REPS, body, init)


cases = {
    # perturb input each trip via a cheap data dependency
    "build(einsum bri,br,brj)": jax.jit(
        lambda s: loop(lambda v: build(v * (1 + 1e-6))[:, 0, :T * 0 + 1]
                       .reshape(B, 1) * 0 + v, d)),
    "cholesky (B,n,n)": jax.jit(
        lambda mm: loop(lambda x: jnp.linalg.cholesky(
            mm + x[0, 0, 0] * 1e-9), mm)),
    "cho_solve 1rhs": jax.jit(
        lambda rr: loop(lambda x: jax.scipy.linalg.cho_solve(
            (chol0, True), x[..., None])[..., 0], rr)),
    "matvec AtDA-free (2 einsums)": jax.jit(
        lambda rr: loop(
            lambda x: jnp.einsum(
                "brn,br->bn", a,
                jnp.einsum("brn,bn->br", a, x,
                           preferred_element_type=jnp.float32, precision=HI)
                * d, preferred_element_type=jnp.float32, precision=HI), r0)),
}

with jax.default_matmul_precision("highest"):
    for name, f in cases.items():
        arg = {"build(einsum bri,br,brj)": d,
               "cholesky (B,n,n)": m0,
               "cho_solve 1rhs": r0,
               "matvec AtDA-free (2 einsums)": r0}[name]
        out = f(arg)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        t0 = time.perf_counter()
        out = f(arg)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:34s}: {dt * 1e3:6.2f} ms/op  (B={B}, T={T}, n={n})")
