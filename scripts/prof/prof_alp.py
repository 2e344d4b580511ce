"""Round-2 profiling probe: where does ALP/AGC-ALP decode time go?"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

from ldpc_tpu.codes.io import read_pcm
from ldpc_tpu.codes.gf2 import gf2_nullspace
from ldpc_tpu.channel.awgn import gen_random_codewords, channel_llr
from ldpc_tpu.decoders.alp import ALPDecoder
from ldpc_tpu.decoders.agc_alp import AGCALPDecoder

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SNR = float(sys.argv[2]) if len(sys.argv) > 2 else -3.0
kind = sys.argv[3] if len(sys.argv) > 3 else "alp"
LP_ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 600

h = read_pcm("data/optimalH.txt")
g, ok = gf2_nullspace(h)
key = jax.random.key(239_239_239)
cw = np.asarray(gen_random_codewords(jax.random.fold_in(key, 1), g, B))
_, llrs = channel_llr(jax.random.fold_in(key, 2), jnp.asarray(cw), SNR)

dec = (ALPDecoder(h, lp_iters=LP_ITERS) if kind == "alp"
       else AGCALPDecoder(h, lp_iters=LP_ITERS))
print(f"{kind} B={B} SNR={SNR} tiers={dec._tiers} cap={dec.capacity} "
      f"lp_iters={dec.lp_iters} lp_max={dec.lp_max_iters} tol={dec.lp_tol}")

st = dec.stats(llrs)
st = {k: np.asarray(v) for k, v in st.items()}
cnt = st["count"]
print(f"rounds={int(st['rounds'])} done={st['done'].sum()}/{B} "
      f"integral={st['integral'].sum()}")
print(f"cut count: min={cnt.min()} p50={np.percentile(cnt,50):.0f} "
      f"p90={np.percentile(cnt,90):.0f} p99={np.percentile(cnt,99):.0f} "
      f"max={cnt.max()}")
if "viol" in st:
    v = st["viol"]
    print(f"viol: p50={np.percentile(v,50):.2e} p90={np.percentile(v,90):.2e}"
          f" max={v.max():.2e}  n(viol>tol)={int((v > dec.lp_tol).sum())}")

# timed decode; block_until_ready is a NO-OP on the axon tunnel — a host
# fetch is the only real sync
r = dec.decode_batch(llrs); _ = np.asarray(r.success)
t0 = time.time()
r = dec.decode_batch(llrs); s = np.asarray(r.success)
dt = time.time() - t0
print(f"decode: {dt:.3f}s for B={B} -> {B/dt:.1f} cw/s  FER~{1-s.mean():.3f}")
