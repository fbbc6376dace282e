"""Ablation profile of the ON-THE-FLY per-frame step at reference scale.

Attributes the OTF-vs-static throughput gap (PERF.md R5.6: 10.1x vs ~66x
RT at comparable pruning) to its structural components, on the SAME
cached 20k-word CL/G pair `scripts/wsj_otf.py` decodes:

  full          the unmodified OTF decoder (CL frontier x bigram G)
  no_g_advance  `_g_advance_seq` stubbed to identity (timing probe ONLY:
                results are wrong) — removes the per-level packed
                (nG, 3R+3) row gathers + dense-root lookups for both the
                candidate advance and the final-state reach
  static_cl     the same artifact/budgets decoded WITHOUT a G network —
                no g column in the frontier sort, single-key dense
                merge, no G advance: the floor the OTF machinery adds to

Run on the real TPU:   python scripts/profile_otf_step.py [B]
"""

import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wsj_bench import ensure_task, sample_utterances  # noqa: E402
from wsj_otf import ensure_cl  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import jax.numpy as jnp

    from juicer_tpu.compile import GramGen, GramType
    from juicer_tpu.decoder.artifact import DecoderArtifact
    from juicer_tpu.decoder.otf import GNetwork
    from juicer_tpu.decoder.tpu_core import TpuDecoder, TpuDecoderConfig
    from juicer_tpu.ops.gmm import make_gmm_scorer

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_wsj_cache_20k")
    _net, models = ensure_task(cache, 20000, 1_500_000)
    cl_net, lexicon = ensure_cl(cache)
    G = GramGen(lexicon.vocab, GramType.NGRAM,
                lm_fname=os.path.join(cache, "lm.arpa")).build()
    g_net = GNetwork(G, pad_cap=256)
    art = DecoderArtifact.load_npz(
        os.path.join(cache, "cl_artifact.npz"), cl_net, models)
    print(f"[cl] {cl_net.n_arcs} arcs; G {g_net.n_states} states "
          f"pad_R={g_net.pad_R} max_backoff={g_net.max_backoff}; "
          f"artifact {art}", flush=True)

    # the certified R5.6 operating point
    cfg = TpuDecoderConfig(
        emit_prune_win=85.0, phone_end_prune_win=60.0, word_prune_win=60.0,
        max_emit_hyps=800, max_insts=2176, expand_budget=3840,
        final_budget=1024, emit_diagnostics=False,
    )
    lex_files = (os.path.join(cache, "phones.lst"),
                 os.path.join(cache, "lex.dict"))
    utts = sample_utterances(cache, models, lex_files, n_utts=8,
                             target_frames=1000, seed=11)
    scorer = make_gmm_scorer(models.flat_params())
    scores = [np.asarray(scorer(jnp.asarray(f))) for _, f in utts]
    Tmax = max(s.shape[0] for s in scores)
    db = jnp.asarray(np.stack([
        np.pad(s, ((0, Tmax - s.shape[0]), (0, 0)), mode="edge")
        for s in scores
    ]), jnp.float32)
    reps = (B + db.shape[0] - 1) // db.shape[0]
    db = jnp.concatenate([db] * reps, axis=0)[:B]
    T = db.shape[1]
    print(f"[scores] batch {B} x T={T}", flush=True)

    def bench(label, dec):
        def one(dev, s):
            saved = dec.dev
            dec.dev = dev
            try:
                carry, ys, rec0 = dec._decode_scan(s.astype(dec._dt))
            finally:
                dec.dev = saved
            return carry["best_final"]["score"], carry["overflow"]

        fj = jax.jit(jax.vmap(one, in_axes=(None, 0)))
        t0 = time.time()
        sc, ov = fj(dec.dev, db)
        sc.block_until_ready()
        compile_s = time.time() - t0
        best = None
        for _ in range(3):
            t0 = time.time()
            sc, ov = fj(dec.dev, db)
            sc.block_until_ready()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        fps = B * T / best
        print(f"[{label:13s}] {fps:8.0f} f/s/chip  "
              f"({best/ (B*T) * 1e6:6.1f} us/frame-row, compile "
              f"{compile_s:.0f}s, overflow {int(np.sum(np.asarray(ov)))})",
              flush=True)
        return fps

    full = bench("full", TpuDecoder(art, cfg, g_network=g_net))

    dec_ng = TpuDecoder(art, cfg, g_network=g_net)

    def _identity_seq(self, g, seq_ids):
        dt = self._dt
        return g, jnp.zeros(g.shape, dt), jnp.ones(g.shape, bool)

    dec_ng._g_advance_seq = types.MethodType(_identity_seq, dec_ng)
    no_adv = bench("no_g_advance", dec_ng)

    static = bench("static_cl", TpuDecoder(art, cfg))

    print(f"\nattribution at B={B}, K={cfg.max_insts}, E={cfg.expand_budget}:"
          f"\n  G advance (packed-row gathers):  "
          f"{1e6/full - 1e6/no_adv:8.1f} us/frame-row saved "
          f"({(no_adv/full - 1):+.0%} fps when removed)"
          f"\n  dual-key merge + g plumbing:     "
          f"({(static/no_adv - 1):+.0%} fps from no_g_advance -> static)"
          f"\n  total OTF overhead:              "
          f"({(static/full - 1):+.0%} fps, static_cl vs full)", flush=True)


if __name__ == "__main__":
    main()
