"""Per-frame AGC-ALP vs an exact-LP (HiGHS) scalar oracle on the real code.

Finds which frames the exact-solver AGC decodes but ours fails, to isolate
the FER quality gap at mid SNR."""
import sys, time
import numpy as np
import jax
from scipy.optimize import linprog

from ldpc_tpu.codes.io import read_pcm
from ldpc_tpu.codes.gf2 import gf2_nullspace
from ldpc_tpu.channel.awgn import gen_random_codewords, channel_llr

sys.path.insert(0, "tests")
from test_alp import scalar_cut_search
from test_gauss import scalar_calculate_gauss

SNR = float(sys.argv[1]) if len(sys.argv) > 1 else -2.0
N = int(sys.argv[2]) if len(sys.argv) > 2 else 64
KW = {}
for _a in sys.argv[3:]:
    _k, _v = _a.split("=")
    try:
        KW[_k] = float(_v) if "." in _v or "e" in _v else int(_v)
    except ValueError:
        KW[_k] = _v


def scalar_agc_alp(h, llr_vec, max_rows=1000, int_tol=1e-6):
    """Exact AGC-ALP per agc_alp.h:80-113 with HiGHS as GLPK."""
    n = h.shape[1]
    a_rows, rhs = [], []
    bounds = [(0, 1)] * n
    x = (np.asarray(llr_vec) < 0).astype(float)
    rounds = 0
    n_h_cuts = 0
    while len(a_rows) < max_rows:
        rounds += 1
        cuts = [c for c in scalar_cut_search(h, x) if c is not None]
        n_h_cuts += len(cuts)
        if not cuts:
            he = scalar_calculate_gauss(h, x, eps=1e-8)
            cuts = [c for c in scalar_cut_search(he, x) if c is not None]
        if not cuts:
            break
        for coef, r in cuts:
            a_rows.append(coef)
            rhs.append(r)
        res = linprog(llr_vec, A_ub=np.array(a_rows), b_ub=np.array(rhs),
                      bounds=bounds, method="highs")
        assert res.status == 0, res.status
        x = res.x
    bits = (x > 0.5).astype(np.uint8)
    integral = bool(np.all((x < int_tol) | (x > 1 - int_tol)))
    ok = integral and not ((h @ bits) % 2).any()
    return bits, ok, len(a_rows), rounds, n_h_cuts


h = read_pcm("data/optimalH.txt")
g, _ = gf2_nullspace(h)
key = jax.random.PRNGKey(239_239_239)
cw = np.asarray(gen_random_codewords(key, g, N))
_, llrs = channel_llr(jax.random.fold_in(key, 1), cw, SNR)
llrs = np.asarray(llrs)

# ours (batched, on whatever backend is active)
from ldpc_tpu.decoders.agc_alp import AGCALPDecoder
import inspect
_sig = set(inspect.signature(AGCALPDecoder.__init__).parameters)
dec = AGCALPDecoder(h, **{k: v for k, v in KW.items() if k in _sig})
for _k, _v in KW.items():
    if _k not in _sig:
        assert hasattr(dec, _k), _k
        setattr(dec, _k, _v)
# decode in chunks: one giant AGC batch is a single long device call, and
# calls that run for minutes kill the tunneled TPU worker (UNAVAILABLE)
CHUNK = 64
ours_ok = np.zeros(N, bool)
st = None
for s in range(0, N, CHUNK):
    sl = slice(s, min(s + CHUNK, N))
    r = dec.decode_batch(llrs[sl])
    ours_ok[sl] = np.asarray(r.success) & ~np.any(
        np.asarray(r.bits) != cw[sl], axis=1)
    part = {k: np.asarray(v) for k, v in dec.stats(llrs[sl]).items()}
    st = part if st is None else {
        k: np.concatenate([st[k], part[k]]) for k in st}
    print(f"  ours {sl.stop}/{N}", flush=True)

oracle_ok = np.zeros(N, bool)
o_rows = np.zeros(N, int)
o_rounds = np.zeros(N, int)
o_hcuts = np.zeros(N, int)
t0 = time.time()
for i in range(N):
    bits, ok, nrows, rounds, n_h = scalar_agc_alp(h, llrs[i])
    oracle_ok[i] = ok and not (bits != cw[i]).any()
    o_rows[i], o_rounds[i], o_hcuts[i] = nrows, rounds, n_h
    if i % 16 == 15:
        print(f"  oracle {i+1}/{N} ({time.time()-t0:.0f}s)", flush=True)

both = (ours_ok & oracle_ok).sum()
only_oracle = (~ours_ok & oracle_ok).sum()
only_ours = (ours_ok & ~oracle_ok).sum()
neither = (~ours_ok & ~oracle_ok).sum()
print(f"SNR={SNR} N={N}: ours FER={1-ours_ok.mean():.3f} "
      f"oracle FER={1-oracle_ok.mean():.3f}")
print(f"agree-ok={both} oracle-only={only_oracle} ours-only={only_ours} "
      f"neither={neither}")
print(f"oracle rows: p50={np.percentile(o_rows,50):.0f} "
      f"p90={np.percentile(o_rows,90):.0f} max={o_rows.max()} | "
      f"H-cuts p50={np.percentile(o_hcuts,50):.0f} | "
      f"rounds p50={np.percentile(o_rounds,50):.0f} "
      f"max={o_rounds.max()}")
print(f"ours  rows: p50={np.percentile(st['count'],50):.0f} "
      f"p90={np.percentile(st['count'],90):.0f} max={st['count'].max()}")
ok_mask = oracle_ok
print(f"oracle rows on oracle-OK frames: "
      f"p50={np.percentile(o_rows[ok_mask],50):.0f} "
      f"max={o_rows[ok_mask].max()}")
idx = np.nonzero(~ours_ok & oracle_ok)[0]
print(f"oracle-only frames: {idx[:10]}")
for i in idx[:6]:
    print(f"  frame {i}: ours count={st['count'][i]} done={st['done'][i]} "
          f"integral={st['integral'][i]} | oracle rows={o_rows[i]} "
          f"rounds={o_rounds[i]} hcuts={o_hcuts[i]}")

# H-vs-gauss budget split, ours vs oracle, on shared-outcome frames
if "cum_h" in st:
    o_gcuts = o_rows - o_hcuts
    for name, m in (("both-ok", ours_ok & oracle_ok),
                    ("oracle-only", ~ours_ok & oracle_ok),
                    ("neither", ~ours_ok & ~oracle_ok)):
        if m.sum() == 0:
            continue
        print(f"{name} (n={m.sum()}): "
              f"ours H p50={np.percentile(st['cum_h'][m],50):.0f} "
              f"G p50={np.percentile(st['cum_g'][m],50):.0f} "
              f"rounds p50={np.percentile(st['rounds'][m],50):.0f} | "
              f"oracle H p50={np.percentile(o_hcuts[m],50):.0f} "
              f"G p50={np.percentile(o_gcuts[m],50):.0f} "
              f"rounds p50={np.percentile(o_rounds[m],50):.0f}")
