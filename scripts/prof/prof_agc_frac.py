"""Fractional-support comparison: our PDHG cut-loop solutions vs exact
HiGHS vertex solutions on the same frames (box LP + our own final cut set,
re-solved exactly). Measures how far our search points are from vertices."""
import sys
import numpy as np
import jax
from scipy.optimize import linprog

from ldpc_tpu.codes.io import read_pcm
from ldpc_tpu.codes.gf2 import gf2_nullspace
from ldpc_tpu.channel.awgn import gen_random_codewords, channel_llr
from ldpc_tpu.decoders.agc_alp import AGCALPDecoder

SNR = float(sys.argv[1]) if len(sys.argv) > 1 else -2.0
N = int(sys.argv[2]) if len(sys.argv) > 2 else 64

h = read_pcm("data/optimalH.txt")
g, _ = gf2_nullspace(h)
key = jax.random.PRNGKey(239_239_239)
cw = np.asarray(gen_random_codewords(key, g, N))
_, llrs = channel_llr(jax.random.fold_in(key, 1), cw, SNR)
llrs = np.asarray(llrs)

dec = AGCALPDecoder(h)
st = jax.jit(dec._run_loop)(llrs)
x = np.asarray(st["x"]); cnt = np.asarray(st["count"])
done = np.asarray(st["done"]); a = np.asarray(st["a"])
rhs = np.asarray(st["rhs"])
ok = np.asarray(dec._finish(st).success) & ~np.any(
    (x > 0.5).astype(np.uint8) != cw, axis=1)

frac_ours = np.sum((x > 0.01) & (x < 0.99), axis=1)
frac_x, obj_gap = [], []
for i in range(N):
    r = cnt[i]
    res = linprog(llrs[i], A_ub=a[i, :r], b_ub=rhs[i, :r],
                  bounds=[(0, 1)] * h.shape[1], method="highs")
    assert res.status == 0
    fx = np.sum((res.x > 1e-6) & (res.x < 1 - 1e-6))
    frac_x.append(fx)
    obj_gap.append(float(llrs[i] @ x[i] - res.fun))
frac_x = np.array(frac_x); obj_gap = np.array(obj_gap)
scale = np.mean(np.abs(llrs), axis=1)

fail = ~ok
print(f"SNR={SNR} N={N} ours-fail={fail.sum()}")
for name, m in (("ok frames", ok), ("fail frames", fail)):
    if m.sum() == 0: continue
    print(f"{name}: frac|ours| p50={np.percentile(frac_ours[m],50):.0f} "
          f"p90={np.percentile(frac_ours[m],90):.0f} | "
          f"frac|exact-vertex| p50={np.percentile(frac_x[m],50):.0f} "
          f"p90={np.percentile(frac_x[m],90):.0f} | "
          f"rel obj gap p50={np.percentile(obj_gap[m]/scale[m],50):.4f} "
          f"p90={np.percentile(obj_gap[m]/scale[m],90):.4f}")
