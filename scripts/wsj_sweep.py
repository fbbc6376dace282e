"""Pruning-ladder sweep at the reference-scale operating point.

wsj_bench.py's first full run (PERF.md R4.3) certified K=8192/E=14336 at
the wide zero-loss point (beam 160 / maxHyps 8000): budgets are set by
the PEAK active count (7147) while the average is 465. This sweep walks
the combined-pruning ladder the reference's userman documents
(juicer_userman.tex:633-673 — main + phone-end + histogram pruning
traded against ~1 % accuracy): for each setting it autotunes budgets,
measures word accuracy over the same batch, and benches steady
throughput, so PERF.md can record f/s/chip as a function of pruning.

Usage:
  python scripts/wsj_sweep.py [--words N] [--batch B] [--frames T]
      [--settings "beam,end,maxhyps[;...]"]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wsj_bench import ensure_task, sample_utterances  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=20000)
    ap.add_argument("--bigrams", type=int, default=1_500_000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--settings", type=str,
                    default="100,75,1200;120,90,2500")
    ap.add_argument("--batches", type=str, default="8",
                    help="comma list of steady-bench batch sizes (utts are "
                         "tiled to fill)")
    ap.add_argument("--unroll", type=int, default=0,
                    help="scan_unroll for the steady bench (0 = heuristic)")
    ap.add_argument("--K", type=int, default=2048,
                    help="autotune probe start (doubles on overflow)")
    ap.add_argument("--E", type=int, default=4096)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f"_wsj_cache_{args.words // 1000}k")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from juicer_tpu.decoder.artifact import DecoderArtifact
    from juicer_tpu.decoder.autotune import autotune_budgets
    from juicer_tpu.decoder.tpu_core import TpuDecoder, TpuDecoderConfig
    from juicer_tpu.harness.editdist import EditDistance
    from juicer_tpu.lexicon import Lexicon
    from juicer_tpu.ops.gmm import make_gmm_scorer

    net, models = ensure_task(cache, args.words, args.bigrams)
    art = DecoderArtifact.load_npz(os.path.join(cache, "artifact.npz"),
                                   net, models)
    print(f"[net] {net.n_arcs} arcs; artifact {art}", flush=True)

    utts = sample_utterances(
        cache, models,
        (os.path.join(cache, "phones.lst"), os.path.join(cache, "lex.dict")),
        n_utts=args.batch, target_frames=args.frames, seed=11)
    scorer = make_gmm_scorer(models.flat_params())
    scores = [np.asarray(scorer(jnp.asarray(f))) for _, f in utts]
    print(f"[utts] T={[s.shape[0] for s in scores]}", flush=True)

    lexicon = Lexicon.load(
        os.path.join(cache, "phones.lst"), os.path.join(cache, "lex.dict"),
        sil_phone="sil", pause_phone="sp",
        sent_start_word="<s>", sent_end_word="</s>", spec_word_char="",
    )
    vocab = lexicon.vocab
    marker_labels = {vocab.sent_start_index + 1, vocab.sent_end_index + 1}
    label_of = {w: vocab.get_index(f"w{w}") + 1 for w in range(args.words)}

    B = args.batch
    Tmax = max(s.shape[0] for s in scores[:B])
    batch_sc = np.stack([
        np.pad(s, ((0, Tmax - s.shape[0]), (0, 0)), mode="edge")
        for s in scores[:B]
    ])
    db = jnp.asarray(batch_sc, jnp.float32)

    rows = []
    for spec in args.settings.split(";"):
        beam, end, mh = (float(x) for x in spec.split(","))
        base = TpuDecoderConfig(
            emit_prune_win=beam, phone_end_prune_win=end,
            word_prune_win=end, max_emit_hyps=int(mh),
            max_insts=args.K, expand_budget=args.E, final_budget=1024,
        )
        t0 = time.time()
        # certify over the WHOLE batch (the first full run certified on 2
        # samples and 1/8 others overflowed)
        tuned = autotune_budgets(art, scores[:B], base, margin=1.4)
        t_tune = time.time() - t0
        print(f"[{spec}] autotune K={tuned.max_insts} E={tuned.expand_budget}"
              f" ({t_tune:.0f}s)", flush=True)

        dec = TpuDecoder(art, dataclasses.replace(tuned,
                                                  emit_diagnostics=True))
        ed = EditDistance()
        peaks, ovf = [], 0
        for (words, _), sc in zip(utts[:B], scores[:B]):
            r = dec.decode_scores(sc)
            peaks.append(r.max_active)
            ovf += int(r.overflow)
            hyp = [w for w in r.words if w not in marker_labels]
            ed.distance(hyp, [label_of[w] for w in words])
        print(f"[{spec}] acc {ed.accuracy*100:.2f}% peak {max(peaks)} "
              f"overflow {ovf}/{B}", flush=True)

        fast = TpuDecoder(art, dataclasses.replace(
            tuned, emit_diagnostics=False, scan_unroll=args.unroll))

        def one(dev, s):
            saved = fast.dev
            fast.dev = dev
            try:
                carry, ys, rec0 = fast._decode_scan(s.astype(fast._dt))
            finally:
                fast.dev = saved
            return carry["best_final"]["score"], carry["overflow"]

        fj = jax.jit(jax.vmap(one, in_axes=(None, 0)))
        fps_of = {}
        for Bs in (int(x) for x in args.batches.split(",")):
            reps = (Bs + B - 1) // B
            dbs = jnp.concatenate([db] * reps, axis=0)[:Bs]
            t0 = time.time()
            out, o = fj(fast.dev, dbs)
            out.block_until_ready()
            print(f"[{spec}] B={Bs} compile+run {time.time()-t0:.0f}s",
                  flush=True)
            t0 = time.time()
            out, o = fj(fast.dev, dbs)
            out.block_until_ready()
            dt = time.time() - t0
            fps_of[Bs] = round(Bs * Tmax / dt, 1)
        fps = max(fps_of.values())
        row = {"beam": beam, "end_beam": end, "maxhyps": int(mh),
               "K": tuned.max_insts, "E": tuned.expand_budget,
               "accuracy": round(ed.accuracy, 4), "peak_active": max(peaks),
               "overflow": ovf, "fps_of_batch": fps_of, "fps": fps,
               "xRT": round(fps / 100, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"metric": "wsj_pruning_sweep", "rows": rows}))


if __name__ == "__main__":
    main()
