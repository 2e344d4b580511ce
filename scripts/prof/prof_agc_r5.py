"""Round-5 AGC-ALP bottleneck profile (fetch-synced timing).

Measures, on the real chip:
  1. end-to-end AGC-ALP decode time and per-lane round counts at B=64;
  2. IPM solve cost vs iteration budget (does the warm-started chunk
     short-circuit actually fire?);
  3. the linear-algebra breakdown of one Newton step: normal-matrix einsum,
     batched Cholesky, cho_solve — each timed alone at HIGHEST precision.

Timing rule (PERF.md): jax.block_until_ready is a NO-OP over the axon
tunnel; every timed region ends with a scalar fetch.
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_tpu.channel.awgn import bpsk, gen_random_codewords, llr_variance
from ldpc_tpu.codes.gf2 import gf2_nullspace
from ldpc_tpu.codes.io import read_pcm
from ldpc_tpu.decoders.agc_alp import AGCALPDecoder
from ldpc_tpu.ops.ipm_solver import ipm_box_lp


def fetch(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def timed(fn, *a, reps=3, **k):
    out = fn(*a, **k)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a, **k)
    fetch(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--snr", type=float, default=-3.0)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--matrix", default="data/optimalH.txt")
    args = p.parse_args()
    B = args.batch

    h = read_pcm(args.matrix)
    g, ok = gf2_nullspace(h)
    key = jax.random.PRNGKey(7)
    cw = jnp.asarray(np.asarray(gen_random_codewords(key, g, B)))
    sigma = float(np.sqrt(float(llr_variance(args.snr))))
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))
    noise = jax.vmap(lambda k: jax.random.normal(k, (h.shape[1],),
                                                 jnp.float32))(keys)
    llrs = (2.0 / float(llr_variance(args.snr))) * (bpsk(cw) + sigma * noise)

    dec = AGCALPDecoder(h)
    dt, _ = timed(lambda x: dec.decode_batch(x).bits, llrs, reps=1)
    st = dec.stats(llrs)
    rounds = np.asarray(st["rounds"])
    counts = np.asarray(st["count"])
    print(f"AGC-ALP end-to-end B={B} @ {args.snr} dB: {dt:.2f} s "
          f"-> {B / dt:.1f} cw/s")
    print(f"  rounds: mean {rounds.mean():.1f} max {rounds.max()} "
          f"p50 {np.percentile(rounds, 50):.0f} "
          f"p90 {np.percentile(rounds, 90):.0f}")
    print(f"  cuts:   mean {counts.mean():.0f} max {counts.max()}")
    print(f"  sum over lanes of rounds = {rounds.sum()} "
          f"(batch pays max() per round: {rounds.max()} rounds)")

    # --- 2. IPM budget scaling on a representative mid-decode system -----
    rng = np.random.default_rng(0)
    n = h.shape[1]
    for T in (512, 1024):
        a = jnp.asarray(rng.integers(-1, 2, (B, T, n)).astype(np.float32))
        b = jnp.asarray((np.abs(rng.normal(size=(B, T))) * 3).astype(
            np.float32))
        c = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
        x0 = jnp.asarray(rng.uniform(0.1, 0.9, (B, n)).astype(np.float32))
        y0 = jnp.abs(jnp.asarray(rng.normal(size=(B, T)).astype(np.float32)))
        for iters in (10, 20, 40):
            f = jax.jit(lambda cc, aa, bb, xx, yy, it=iters: ipm_box_lp(
                cc, aa, bb, iters=it, tol=1e-5, x0=xx, y0=yy))
            dt, out = timed(f, c, a, b, x0, y0, reps=2)
            err = float(np.max(np.asarray(out[2])))
            print(f"  ipm T={T} iters={iters}: {dt * 1e3:.0f} ms "
                  f"(max err {err:.2e})")

    # --- 3. Newton-step linalg breakdown --------------------------------
    with jax.default_matmul_precision("highest"):
        T = 1024
        a = jnp.asarray(rng.integers(-1, 2, (B, T, n)).astype(np.float32))
        d = jnp.asarray(np.abs(rng.normal(size=(B, T))).astype(np.float32))
        dx = jnp.asarray(np.abs(rng.normal(size=(B, n))).astype(np.float32))
        r = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
        eye = jnp.eye(n, dtype=jnp.float32)

        def build(a, d, dx):
            m = jnp.einsum("bri,br,brj->bij", a, d, a,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            return m + jax.vmap(jnp.diag)(dx) + 1e-6 * eye[None]

        build_j = jax.jit(build)
        dt_b, m = timed(build_j, a, d, dx, reps=5)
        chol_j = jax.jit(jnp.linalg.cholesky)
        dt_c, chol = timed(chol_j, m, reps=5)
        solve_j = jax.jit(lambda ch, rr: jax.scipy.linalg.cho_solve(
            (ch, True), rr[..., None])[..., 0])
        dt_s, _ = timed(solve_j, chol, r, reps=5)
        print(f"  newton parts (T={T}, B={B}, n={n}): "
              f"normal-build {dt_b * 1e3:.1f} ms, cholesky {dt_c * 1e3:.1f} "
              f"ms, cho_solve {dt_s * 1e3:.1f} ms")
        print(f"  -> per Newton step ~ build + chol + 2x solve = "
              f"{(dt_b + dt_c + 2 * dt_s) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
