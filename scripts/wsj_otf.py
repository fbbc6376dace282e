"""Reference-scale ON-THE-FLY composition benchmark (BASELINE config 4).

The reference's fourth headline configuration decodes with the large LM
G kept SEPARATE from the search network: the decoder searches CL and
intersects word labels with G lazily (`WFSTOnTheFlyDecoder.cpp`). This
script runs the jtpu equivalent on the SAME cached 20k-word task the
static bench uses (scripts/wsj_bench.py): it builds CL = C ∘ closure(L)
through the own pipeline (cached), wraps the cached bigram G as a
`GNetwork` (padded-row + dense-row match-or-backoff tables), autotunes
(arc, g)-pair budgets, measures word accuracy against the generating
transcripts, checks oracle parity vs `RefOtfDecoder`, and benches
steady throughput — the OTF number directly comparable to the static
det(CLG) number on the same acoustics.

Usage:
  python scripts/wsj_otf.py [--words N] [--batch B] [--frames T]
      [--beam W] [--end-beam W] [--maxhyps N] [--batches 8]
      [--pad-cap R] [--pushing] [--parity N] [--cpu] [--unroll u]
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

from wsj_bench import ensure_task, sample_utterances, steady_bench  # noqa: E402


def ensure_cl(cache):
    """Build (or load) the CL half of the OTF pair: C ∘ closure(L) with
    aux phones removed on the input side, G untouched. Cached as cl.npz
    next to the static clg.npz."""
    from juicer_tpu.compile import CDGen, CDPhoneLookup, CDType, LexGen
    from juicer_tpu.decoder.network import DecoderNetwork
    from juicer_tpu.fst import algos
    from juicer_tpu.lexicon import Lexicon

    cl_npz = os.path.join(cache, "cl.npz")
    lexicon = Lexicon.load(
        os.path.join(cache, "phones.lst"), os.path.join(cache, "lex.dict"),
        sil_phone="sil", pause_phone="sp",
        sent_start_word="<s>", sent_end_word="</s>", spec_word_char="",
    )
    if os.path.exists(cl_npz):
        print(f"[cl] loading cached {cl_npz}", flush=True)
        return DecoderNetwork.load_npz(cl_npz), lexicon

    t0 = time.time()
    lexgen = LexGen(lexicon)
    L = lexgen.build(output_aux_phones=True)
    # det(L) is what makes OTF scale: the raw lexicon FSM is one chain
    # per word from the root (word label on the first arc, mirroring the
    # reference lexgen), so a word-end closure would fan out to every
    # word's first arc (max_fanout ≈ |vocab|, E budgets ~20k/frame at
    # reference scale). Gallic-residual determinization shares prefixes
    # AND delays each word label until its path is disambiguated, so the
    # loop-state fanout drops to ~|phones| and word labels cross
    # mid-word where the pronunciation becomes unique.
    L = algos.minimize(algos.determinize(algos.arcsort(L)))
    phones = [p for p in lexicon.phone_set.phones]
    lookup = CDPhoneLookup(lexicon.phone_set)
    lookup.add_phones(phones)
    lookup.bind_models(phones)
    C = CDGen(CDType.MONOPHONE, lookup, phones,
              n_aux_syms=lexgen.n_aux).build()
    cl = algos.compose(C, algos.closure(algos.arcsort(L)))
    cl.isyms, cl.osyms = C.isyms, L.osyms
    print(f"[cl] C∘closure(det(L)): {cl.num_states} states {cl.num_arcs} "
          f"arcs ({time.time()-t0:.1f}s)", flush=True)
    net = DecoderNetwork(cl, C.isyms, L.osyms, remove_aux="input")
    net.save_npz(cl_npz)
    return net, lexicon


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=20000)
    ap.add_argument("--bigrams", type=int, default=1_500_000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--beam", type=float, default=85.0)
    ap.add_argument("--end-beam", type=float, default=60.0)
    ap.add_argument("--maxhyps", type=int, default=800)
    ap.add_argument("--batches", type=str, default="8")
    ap.add_argument("--unroll", type=int, default=0)
    ap.add_argument("--pad-cap", type=int, default=256,
                    help="GNetwork padded-row width; states with more "
                         "word arcs use dense vocab-indexed rows")
    ap.add_argument("--K", type=int, default=4096)
    ap.add_argument("--E", type=int, default=8192)
    ap.add_argument("--pushing", action="store_true",
                    help="label-and-weight pushing mode")
    ap.add_argument("--parity", type=int, default=2,
                    help="RefOtfDecoder parity on N held-out short utts")
    ap.add_argument("--no-bench", action="store_true")
    ap.add_argument("--no-tune", action="store_true",
                    help="use --K/--E as the exact budgets (certified "
                         "elsewhere; the accuracy loop still counts "
                         "overflow)")
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f"_wsj_cache_{args.words // 1000}k")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from juicer_tpu.compile import GramGen, GramType
    from juicer_tpu.decoder.artifact import DecoderArtifact
    from juicer_tpu.decoder.autotune import autotune_budgets
    from juicer_tpu.decoder.otf import GNetwork, RefOtfDecoder
    from juicer_tpu.decoder.tpu_core import TpuDecoder, TpuDecoderConfig
    from juicer_tpu.harness.editdist import EditDistance
    from juicer_tpu.ops.gmm import make_gmm_scorer

    # task (ensures lexicon/lm files + models exist; static clg cache is
    # reused but not decoded here)
    _net, models = ensure_task(cache, args.words, args.bigrams)
    cl_net, lexicon = ensure_cl(cache)
    print(f"[cl] {cl_net.n_states} states {cl_net.n_arcs} arcs "
          f"(static CLG: {_net.n_arcs} arcs)", flush=True)

    t0 = time.time()
    G = GramGen(lexicon.vocab, GramType.NGRAM,
                lm_fname=os.path.join(cache, "lm.arpa")).build()
    g_net = GNetwork(G, pad_cap=args.pad_cap)
    n_dense = int(np.sum(g_net.dense_idx >= 0))
    print(f"[g] {g_net.n_states} states, {len(g_net.arc_il)} word arcs, "
          f"pad_R={g_net.pad_R}, {n_dense} dense states "
          f"(dense tables {n_dense * g_net.W * 8 / 1e6:.0f} MB f32), "
          f"max_backoff={g_net.max_backoff} ({time.time()-t0:.1f}s)",
          flush=True)

    t0 = time.time()
    art_npz = os.path.join(cache, "cl_artifact.npz")
    if os.path.exists(art_npz):
        art = DecoderArtifact.load_npz(art_npz, cl_net, models)
    else:
        art = DecoderArtifact(cl_net, models)
        art.save_npz(art_npz)
    print(f"[artifact] {art} ({time.time()-t0:.1f}s)", flush=True)

    lex_files = (os.path.join(cache, "phones.lst"),
                 os.path.join(cache, "lex.dict"))
    utts = sample_utterances(cache, models, lex_files, n_utts=args.batch,
                             target_frames=args.frames, seed=args.seed)
    par_utts = sample_utterances(cache, models, lex_files,
                                 n_utts=max(args.parity, 1),
                                 target_frames=150, seed=args.seed + 1)
    scorer = make_gmm_scorer(models.flat_params())
    scores = [np.asarray(scorer(jnp.asarray(f))) for _, f in utts]
    par_scores = [np.asarray(scorer(jnp.asarray(f))) for _, f in par_utts]
    print(f"[utts] {len(utts)} utterances, T={[s.shape[0] for s in scores]}",
          flush=True)

    base = TpuDecoderConfig(
        emit_prune_win=args.beam, phone_end_prune_win=args.end_beam,
        word_prune_win=args.end_beam, max_emit_hyps=args.maxhyps,
        max_insts=args.K, expand_budget=args.E, final_budget=1024,
        otf_pushing=args.pushing,
    )
    if args.no_tune:
        tuned = base
        print(f"[budgets] K={tuned.max_insts} E={tuned.expand_budget} "
              f"(--no-tune)", flush=True)
    else:
        t0 = time.time()
        tuned = autotune_budgets(art, scores, base, margin=1.4,
                                 g_network=g_net, verbose=True)
        print(f"[autotune] K={tuned.max_insts} E={tuned.expand_budget} "
              f"({time.time()-t0:.1f}s)", flush=True)

    vocab = lexicon.vocab
    marker_labels = {vocab.sent_start_index + 1, vocab.sent_end_index + 1}
    label_of = {w: vocab.get_index(f"w{w}") + 1 for w in range(args.words)}

    dec = TpuDecoder(art, dataclasses.replace(tuned, emit_diagnostics=True),
                     g_network=g_net)
    ed = EditDistance()
    peaks, ovf = [], 0
    for (words, _), sc in zip(utts, scores):
        r = dec.decode_scores(sc)
        peaks.append(r.max_active)
        ovf += int(r.overflow)
        hyp = [w for w in r.words if w not in marker_labels]
        ed.distance(hyp, [label_of[w] for w in words])
    print(f"[accuracy] {ed.summary().replace(chr(10), '; ')}; "
          f"peak {max(peaks)}, overflow {ovf}/{len(utts)}", flush=True)

    if args.parity:
        for i, ((words, _), sc) in enumerate(
                zip(par_utts[:args.parity], par_scores[:args.parity])):
            r_tpu = dec.decode_scores(sc)
            ref = RefOtfDecoder(
                cl_net, g_net, models, phone_start_prune_win=0.0,
                emit_prune_win=tuned.emit_prune_win,
                phone_end_prune_win=tuned.phone_end_prune_win,
                word_prune_win=tuned.word_prune_win,
                max_emit_hyps=tuned.max_emit_hyps,
            )
            t0 = time.time()
            r_ref = ref.decode(score_fn=lambda t, g: float(sc[t, g]),
                               n_frames=sc.shape[0])
            ok = r_ref.words == r_tpu.words
            print(f"[parity] utt {i}: {'exact' if ok else 'MISMATCH'} "
                  f"({len(r_ref.words)} words, oracle {time.time()-t0:.1f}s)",
                  flush=True)
            if not ok:
                print(f"  engine {r_tpu.words}\n  oracle {r_ref.words}",
                      flush=True)

    if not args.no_bench:
        B = args.batch
        Tmax = max(s.shape[0] for s in scores)
        db = jnp.asarray(np.stack([
            np.pad(s, ((0, Tmax - s.shape[0]), (0, 0)), mode="edge")
            for s in scores
        ]), jnp.float32)
        bench = steady_bench(art, tuned, db,
                             [int(x) for x in args.batches.split(",")],
                             unroll=args.unroll, g_network=g_net)
        for Bs, rec in bench.items():
            print(f"[bench] B={Bs}: {rec['fps']:.0f} f/s/chip = "
                  f"{rec['fps']/100:.1f}x RT (compile {rec['compile_s']}s, "
                  f"overflow {rec['overflow']}/{Bs})", flush=True)
        best = max((r["fps"] for r in bench.values() if r["overflow"] == 0),
                   default=0.0)
        print(json.dumps({
            "metric": "wsj_otf_frames_per_sec_chip", "value": best,
            "cl_arcs": int(cl_net.n_arcs), "g_states": int(g_net.n_states),
            "K": tuned.max_insts, "E": tuned.expand_budget,
            "accuracy": round(ed.accuracy, 4), "pushing": args.pushing,
            "xRT": round(best / 100, 1),
        }))


if __name__ == "__main__":
    main()
