"""Pruning-ladder sweep at the reference-scale operating point.

wsj_bench.py's first full run (PERF.md R4.3) certified K=8192/E=14336 at
the wide zero-loss point (beam 160 / maxHyps 8000): budgets are set by
the PEAK active count (7147) while the average is 465. This sweep walks
the combined-pruning ladder the reference's userman documents
(juicer_userman.tex:633-673 — main + phone-end + histogram pruning
traded against ~1 % accuracy): for each setting it autotunes budgets,
measures word accuracy over the batch, benches steady throughput (with
per-batch overflow counted from the benched program itself), and
optionally checks f32-engine-vs-f64-oracle word parity on held-out
short utterances.

`--center-scale` draws the per-phone GMM centers closer together
(models_cs*.npz cached next to the task; network/artifact unchanged),
producing confusable acoustics where tighter pruning MEASURABLY costs
words — the accuracy-degradation curve the reference's userman reports
(VERDICT r4 item 2).

Usage:
  python scripts/wsj_sweep.py [--words N] [--batch B] [--frames T]
      [--settings "beam,end,maxhyps[;...]"] [--batches 8,16]
      [--center-scale S] [--parity N] [--unroll u]
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

from wsj_bench import (ensure_artifact, ensure_models, ensure_task,  # noqa: E402
                       mismatch_models, sample_utterances, steady_bench)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=20000)
    ap.add_argument("--bigrams", type=int, default=1_500_000)
    ap.add_argument("--batch", type=int, default=8,
                    help="eval-set size (accuracy utterances)")
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
    ap.add_argument("--center-scale", type=float, default=1.2,
                    help="GMM center spread; lower = harder acoustics "
                         "(task models are built at 1.2)")
    ap.add_argument("--free-text", action="store_true",
                    help="uniform-random transcripts (LM in tension with "
                         "the acoustics) instead of bigram walks")
    ap.add_argument("--mismatch", type=float, default=0.0,
                    help="decode-side GMM mean perturbation sigma "
                         "(train/test mismatch; features stay generated "
                         "from the clean models)")
    ap.add_argument("--parity", type=int, default=0,
                    help="per-setting oracle parity on N held-out short "
                         "utterances (f32 engine words vs f64 oracle)")
    ap.add_argument("--no-bench", action="store_true",
                    help="accuracy/certification only (skip steady bench)")
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f"_wsj_cache_{args.words // 1000}k")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from juicer_tpu.decoder.autotune import autotune_budgets
    from juicer_tpu.decoder.ref_core import RefDecoder
    from juicer_tpu.decoder.tpu_core import TpuDecoder, TpuDecoderConfig
    from juicer_tpu.harness.editdist import EditDistance
    from juicer_tpu.lexicon import Lexicon
    from juicer_tpu.ops.gmm import make_gmm_scorer

    net, task_models = ensure_task(cache, args.words, args.bigrams)
    models = ensure_models(cache, args.center_scale)
    dec_models = mismatch_models(models, args.mismatch)
    # the artifact depends only on network + model topology/transitions,
    # both invariant across center_scale
    art = ensure_artifact(cache, net, task_models)
    print(f"[net] {net.n_arcs} arcs; artifact {art}; "
          f"center_scale {args.center_scale} mismatch {args.mismatch}",
          flush=True)

    lex_files = (os.path.join(cache, "phones.lst"),
                 os.path.join(cache, "lex.dict"))
    utts = sample_utterances(cache, models, lex_files, n_utts=args.batch,
                             target_frames=args.frames, seed=args.seed,
                             free_text=args.free_text)
    par_utts = []
    if args.parity:
        par_utts = sample_utterances(cache, models, lex_files,
                                     n_utts=args.parity, target_frames=150,
                                     seed=args.seed + 1,
                                     free_text=args.free_text)
    scorer = make_gmm_scorer(dec_models.flat_params())
    scores = [np.asarray(scorer(jnp.asarray(f))) for _, f in utts]
    par_scores = [np.asarray(scorer(jnp.asarray(f))) for _, f in par_utts]
    n_ref_words = sum(len(w) for w, _ in utts)
    print(f"[utts] {len(utts)} utterances, {n_ref_words} words, "
          f"T(mean)={np.mean([s.shape[0] for s in scores]):.0f}", flush=True)

    lexicon = Lexicon.load(
        *lex_files, sil_phone="sil", pause_phone="sp",
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
        # certify over the WHOLE eval batch (2-sample certification left
        # 1/8 utterances overflowing on the first full run, PERF.md R4.3).
        # A setting whose certification fails (e.g. the f32 record-id
        # ceiling T*K >= 2^24 on a wide point over confusable acoustics)
        # is recorded as such instead of killing the whole sweep.
        try:
            tuned = autotune_budgets(art, scores[:B], base, margin=1.4,
                                     verbose=True)
        except Exception as e:
            print(f"[{spec}] autotune FAILED: {e}", flush=True)
            rows.append({"beam": beam, "end_beam": end, "maxhyps": int(mh),
                         "error": str(e)})
            continue
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

        parity_ok = None
        if args.parity:
            parity_ok = 0
            for (words, _), sc in zip(par_utts, par_scores):
                r_tpu = dec.decode_scores(sc)
                ref = RefDecoder(
                    net, dec_models, phone_start_prune_win=0.0,
                    emit_prune_win=tuned.emit_prune_win,
                    phone_end_prune_win=tuned.phone_end_prune_win,
                    word_prune_win=tuned.word_prune_win,
                    max_emit_hyps=tuned.max_emit_hyps,
                )
                r_ref = ref.decode(
                    score_fn=lambda t, g: float(sc[t, g]),
                    n_frames=sc.shape[0])
                if r_ref.words == r_tpu.words:
                    parity_ok += 1
                else:
                    print(f"[{spec}] parity MISMATCH: engine {r_tpu.words} "
                          f"vs oracle {r_ref.words}", flush=True)
            print(f"[{spec}] oracle parity {parity_ok}/{len(par_utts)}",
                  flush=True)

        fps_of, fps, bench = {}, None, {}
        if not args.no_bench:
            try:
                bench = steady_bench(
                    art, tuned, db,
                    [int(x) for x in args.batches.split(",")],
                    unroll=args.unroll)
            except Exception as e:  # e.g. OOM at wide certified budgets
                print(f"[{spec}] bench FAILED: {e}", flush=True)
                bench = {}
            for Bs, rec in bench.items():
                print(f"[{spec}] B={Bs}: {rec['fps']:.0f} f/s "
                      f"(compile {rec['compile_s']}s, overflow "
                      f"{rec['overflow']}/{Bs})", flush=True)
            fps_of = {Bs: rec["fps"] for Bs, rec in bench.items()
                      if rec["overflow"] == 0}
            fps = max(fps_of.values()) if fps_of else 0.0

        row = {"beam": beam, "end_beam": end, "maxhyps": int(mh),
               "K": tuned.max_insts, "E": tuned.expand_budget,
               "accuracy": round(ed.accuracy, 4),
               "errors": ed.n_ins + ed.n_del + ed.n_sub,
               "n_words": ed.n_ref,
               "peak_active": max(peaks), "overflow": ovf,
               "parity_ok": parity_ok,
               "bench": None if args.no_bench else {
                   str(Bs): rec for Bs, rec in bench.items()},
               "best_fps": fps,
               "xRT": None if fps is None else round(fps / 100, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"metric": "wsj_pruning_sweep",
                      "center_scale": args.center_scale,
                      "mismatch": args.mismatch,
                      "free_text": args.free_text, "rows": rows}))


if __name__ == "__main__":
    main()
