"""Population-parallel quasi-cyclic check-matrix optimization — the
``make optimize`` equivalent (``optimize_H.cpp``).

The reference runs a *serial* local descent: one random block mutation per
step, each evaluated with a 200-thread QP-ADMM FER estimate
(``optimize_H.cpp:88-104``). TPU-native redesign (SURVEY.md §2, parallelism
item 4): each generation proposes a *population* of mutations, evaluates all
of their FERs concurrently in one compiled program — QP-ADMM vmapped over
capacity-padded problem structures (one per candidate H) on top of the trial
batch — and greedily accepts the best strict improvement. Checkpoints the
accepted matrix on every accept (``optimize_H.cpp:96-101``) plus a JSON state
file for resume.

Evaluation semantics per candidate mirror ``FER()`` (``optimize_H.cpp:16-25``):
singular H scores 1.0; otherwise codewords are regenerated from the
candidate's own generator matrix with the same base seed; QP-ADMM runs with
alpha=1.95, mu=0.5, 1000 iterations at SNR=-3.

Run:  python -m ldpc_tpu.apps.optimize_h --generations 200 --population 8
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..channel.awgn import bpsk, gen_random_codewords, llr_variance
from ..codes.gf2 import gf2_nullspace
from ..codes.io import read_pcm, save_matrix
from ..codes.qc import QCMatrix
from ..config import OptimizeConfig, add_dataclass_args, apply_args
from ..decoders.admm import ADMMStructure, decode_qp_admm


def _caps_for_grid(cfg: OptimizeConfig):
    """Worst-case structure capacities for any (rb x cb, z) QC matrix."""
    m = cfg.block_rows * cfg.block_size
    n = cfg.block_cols * cfg.block_size
    d_max = cfg.block_cols                       # max row degree
    dv_max = cfg.block_rows                      # max col degree
    n_aux = m * max(d_max - 3, 0)
    n_var = n + n_aux
    per_row = max(4 * max(d_max - 2, 1), 2)
    n_con = m * per_row
    k_max = max(4 * dv_max, 8)                   # vars: 4/check; aux: 8
    return dict(n_var_cap=n_var, n_con_cap=n_con, k_max_cap=k_max)


class PopulationEvaluator:
    """Jit-compiled FER evaluation of P candidate matrices at once.

    With ``sharding`` (a :class:`ldpc_tpu.parallel.mesh.TrialSharding`), the
    population axis is sharded over the device mesh (SURVEY.md §2,
    parallelism item 4): each device evaluates P/D candidates' trial
    batches, and the generation's argmin-accept runs as a collective inside
    one jitted reduction.
    """

    def __init__(self, cfg: OptimizeConfig, n: int, sharding=None):
        self.cfg = cfg
        self.n = n
        self.caps = _caps_for_grid(cfg)
        self.sharding = sharding
        self._fn = None
        # collective argmin over the (possibly sharded) per-candidate
        # correct-counts: returns (best index, best count)
        self._argbest = jax.jit(
            lambda c: (jnp.argmax(c), jnp.max(c)))

    def _compile(self, trial_batch: int):
        cfg = self.cfg

        def correct_counts(tables, llrs, cw):
            res = decode_qp_admm(tables, self.n, llrs, cfg.admm_alpha,
                                 cfg.admm_mu, cfg.admm_max_iter, 1e-5)
            good = res.success & jnp.all(res.bits == cw, axis=-1)
            return jnp.sum(good.astype(jnp.int32))

        self._fn = jax.jit(jax.vmap(correct_counts))

    def _place(self, tree):
        """Shard a (P, ...) pytree over the mesh population axis."""
        if self.sharding is None:
            return tree
        sh = self.sharding

        def put(x):
            if x.shape[0] % sh.num_devices == 0:
                spec = (sh.batch_sharding if x.ndim > 1
                        else sh.index_sharding)
                return jax.device_put(x, spec)
            return x
        return jax.tree.map(put, tree)

    def evaluate(self, candidates: list[np.ndarray], key,
                 trials: int, trial_batch: int = 512) -> np.ndarray:
        """FER per candidate dense H. Returns (P,) float."""
        cfg = self.cfg
        p_count = len(candidates)
        fers = np.ones(p_count)
        live = []
        tables_list, cw_list = [], []
        cw_key, noise_key = jax.random.split(key)
        for pi, h in enumerate(candidates):
            g, ok = gf2_nullspace(h)
            if not ok:
                continue                          # singular -> FER 1.0
            live.append(pi)
            s = ADMMStructure.from_h(h, **self.caps)
            tables_list.append({
                "con_var": s.con_var, "con_coef": s.con_coef, "b": s.b,
                "var_con": s.var_con, "var_coef": s.var_coef, "e": s.e})
            cw_list.append(np.asarray(
                gen_random_codewords(cw_key, g, trials)))
        if not live:
            return fers
        if self._fn is None:
            self._compile(trial_batch)

        # pad the live set to the population size so one compiled program
        # shape serves every generation. Pad slots replicate a live
        # structure and their decodes are discarded below — a static-shape
        # tax paid only when candidates are singular (rare for QC matrices
        # at these block counts).
        while len(tables_list) < max(p_count, 1):
            tables_list.append(tables_list[-1])
            cw_list.append(cw_list[-1])

        stacked = self._place(
            {k: jnp.asarray(np.stack([t[k] for t in tables_list]))
             for k in tables_list[0]})
        cw_all = np.stack(cw_list)                # (P, T, n)

        sigma = float(np.sqrt(float(llr_variance(cfg.snr))))
        inv_var = float(2.0 / float(llr_variance(cfg.snr)))

        # Noise is SHARED across candidates (common random numbers): every
        # proposal sees the same channel realizations, so FER differences
        # between candidates are decoder-induced, not noise-draw variance —
        # the same variance-reduction the reference gets implicitly from
        # regenerating noise with the same base seed (optimize_H.cpp:21-23).
        correct_dev = None
        for start in range(0, trials, trial_batch):
            stop = min(start + trial_batch, trials)
            idx = jnp.arange(start, stop, dtype=jnp.int32)
            keys = jax.vmap(lambda i: jax.random.fold_in(noise_key, i))(idx)
            noise = jax.vmap(lambda k: jax.random.normal(
                k, (self.n,), jnp.float32))(keys)      # (t, n) shared
            cw_chunk = self._place(jnp.asarray(cw_all[:, start:stop]))
            llrs = inv_var * (bpsk(cw_chunk) + sigma * noise[None])
            out = self._fn(stacked, llrs, cw_chunk)
            correct_dev = out if correct_dev is None else correct_dev + out
        # collective argmax over the sharded population axis (the
        # generation's argmin-FER accept); pad slots replicate the last
        # live candidate, so a pad win maps back to it
        n_live = len(live)
        best_slot, _ = self._argbest(correct_dev)
        self.last_best = live[min(int(best_slot), n_live - 1)]
        correct = np.asarray(correct_dev, np.int64)
        for li, pi in enumerate(live):
            fers[pi] = 1.0 - correct[li] / trials
        return fers


def optimize(cfg: OptimizeConfig, log=print):
    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)

    state_loaded = False
    if cfg.state_path and os.path.exists(cfg.state_path):
        with open(cfg.state_path) as f:
            st = json.load(f)
        qc = QCMatrix(cfg.block_size, np.array(st["present"], bool),
                      np.array(st["shifts"], np.int64))
        current_fer = st["fer"]
        start_gen = st["generation"]
        state_loaded = True
        log(f"resumed from {cfg.state_path} @ generation {start_gen}, "
            f"FER={current_fer:.5f}", file=sys.stderr)
    elif cfg.init_matrix:
        qc = QCMatrix.from_dense(read_pcm(cfg.init_matrix), cfg.block_size)
        start_gen = 0
    else:
        qc = QCMatrix.random(rng, cfg.block_size, cfg.block_rows,
                             cfg.block_cols)
        start_gen = 0

    sharding = None
    if len(jax.devices()) > 1 and cfg.population % len(jax.devices()) == 0:
        from ..parallel.mesh import make_trial_mesh
        sharding = make_trial_mesh(axis_name="pop")
        log(f"population sharded over {sharding.num_devices} devices",
            file=sys.stderr)
    ev = PopulationEvaluator(cfg, cfg.block_cols * cfg.block_size, sharding)
    if not state_loaded:
        current_fer = float(ev.evaluate([qc.to_dense()], key,
                                        cfg.trials)[0])
    log(f"initial FER={current_fer:.5f}")

    # ceil: the proposal budget is cfg.generations total proposals (the
    # reference's 10,000 serial proposals, optimize_H.cpp:133); a floor
    # division would silently shrink it by up to population-1
    rounds = max(1, -(-(cfg.generations - start_gen) // cfg.population))
    for gen in range(rounds):
        t0 = time.perf_counter()
        proposals = [qc.random_mutation(rng) for _ in range(cfg.population)]
        fers = ev.evaluate([p.to_dense() for p in proposals], key, cfg.trials)
        best = int(np.argmin(fers))
        log(f"\tgeneration {start_gen + gen * cfg.population}: "
            f"best proposal FER={fers[best]:.5f} "
            f"({time.perf_counter() - t0:.2f}s for {cfg.population} "
            f"proposals)")
        if fers[best] < current_fer:
            qc = proposals[best]
            current_fer = float(fers[best])
            log(f"accept, FER={current_fer:.5f}")
            save_matrix(qc.to_dense(), cfg.save_path)
            if cfg.state_path:
                with open(cfg.state_path, "w") as f:
                    json.dump({"present": qc.present.tolist(),
                               "shifts": qc.shifts.tolist(),
                               "fer": current_fer,
                               "generation": start_gen + (gen + 1) *
                               cfg.population}, f)
    final = float(ev.evaluate([qc.to_dense()], key, cfg.final_trials)[0])
    log(f"final FER ({cfg.final_trials} trials): {final:.5f}")
    return qc, final


def main(argv=None):
    cfg = OptimizeConfig()
    p = argparse.ArgumentParser(description=__doc__)
    add_dataclass_args(p, cfg)
    apply_args(cfg, p.parse_args(argv))
    optimize(cfg)


if __name__ == "__main__":
    main()
