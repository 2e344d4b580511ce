"""Wall-time breakdown of the batched IPM at each cut-buffer tier."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from ldpc_tpu.ops.ipm_solver import ipm_box_lp

BSZ = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = 280

rng = np.random.default_rng(5)
for tier in (128, 256, 512, 1024):
    aa = np.zeros((BSZ, tier, N), np.float32)
    bb = np.zeros((BSZ, tier), np.float32)
    cc = rng.normal(0, 4, (BSZ, N)).astype(np.float32)
    n_act = int(tier * 0.9)
    for l in range(BSZ):
        for i in range(n_act):
            k = rng.integers(5, 9) if i % 3 else N // 2
            supp = rng.choice(N, size=k, replace=False)
            sgn = rng.choice([-1.0, 1.0], size=k)
            if (sgn > 0).sum() == 0:
                sgn[0] = 1.0
            aa[l, i, supp] = sgn
            bb[l, i] = (sgn > 0).sum() - 1
    f = jax.jit(lambda c, a, b: ipm_box_lp(c, a, b, iters=40))
    c, a, b = jnp.asarray(cc), jnp.asarray(aa), jnp.asarray(bb)
    r = f(c, a, b)
    jax.block_until_ready(r)
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        r = f(c, a, b)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / reps
    print(f"tier {tier:5d}: {dt*1e3:8.1f} ms/solve (batch {BSZ}) "
          f"err_max={float(jnp.max(r[2])):.2e}")
