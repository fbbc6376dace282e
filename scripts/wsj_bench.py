"""Reference-scale END-TO-END operating point (the round-4 headline).

Unlike scripts/scale_bench.py (random topology, random scores, budgets
always binding), this builds a COMPLETE WSJ-order recognition task
through the framework's own offline pipeline and decodes synthesized
utterances whose scores actually prune:

  1. synthetic 20k-word task at reference statistics (BASELINE.md: the
     WSJ 20k machine is 1.32M states / 5.41M arcs from an 18k-word
     bigram with 1.34M bigrams): random lexicon, synthetic bigram ARPA,
     GramGen/LexGen/CDGen + build_clg (native determinize);
  2. generative GMM models confusable enough to give WSJ-like active
     set profiles; utterances sampled from the bigram + the models;
  3. `autotune_budgets` certifies minimal (K, E) with margin on sample
     utterances — no overflow, verified 1-best;
  4. steady-state batch decode on the real chip -> frames/s/chip + xRT;
  5. exact 1-best parity vs the f64 oracle (RefDecoder) on short
     utterances, and word accuracy vs the generating transcript.

Usage:
  python scripts/wsj_bench.py [--quick] [--build-only] [--batch B]
      [--words N] [--bigrams M] [--beam W] [--end-beam W] [--maxhyps N]
      [--cache DIR] [--no-parity]

The task build is cached under scripts/_wsj_cache (CLG npz + models npz
+ bigram tables); delete the dir to rebuild.
"""

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LN10 = math.log(10.0)


def log10(p):
    return math.log10(max(p, 1e-30))


def gen_task_files(cache, n_words, n_bigrams, n_phones, seed):
    """Write lexicon/phones/ARPA files + bigram successor tables."""
    rng = np.random.default_rng(seed)
    os.makedirs(cache, exist_ok=True)
    phones = [f"p{i:02d}" for i in range(n_phones)]
    with open(os.path.join(cache, "phones.lst"), "w") as fd:
        for p in phones:
            fd.write(p + "\n")
        fd.write("sil\nsp\n")

    # pronunciations: English-like length profile AND English-like prefix
    # sharing — phones drawn from a Zipf distribution (a handful of
    # frequent phones start most words, so the det(L.G) lexicon tries
    # compress like a real dictionary; uniform-random phones share no
    # prefixes and blow det(L.G) up ~8x past reference statistics)
    phone_p = 1.0 / (np.arange(1, n_phones + 1) ** 1.1)
    phone_p /= phone_p.sum()
    seen = set()
    prons = []
    while len(prons) < n_words:
        n = int(np.clip(rng.normal(6.0, 2.0), 2, 11))
        t = tuple(rng.choice(n_phones, size=n, p=phone_p).tolist())
        if t in seen:
            continue
        seen.add(t)
        prons.append(t)
    with open(os.path.join(cache, "lex.dict"), "w") as fd:
        for wi, pron in enumerate(prons):
            fd.write(f"w{wi} " + " ".join(phones[p] for p in pron) + "\n")
        fd.write("<s> sil\n</s> sil\n")

    # synthetic bigram LM: Zipf unigrams, per-word successor sets sized so
    # the total matches n_bigrams
    uni = 1.0 / (np.arange(1, n_words + 1) ** 0.9)
    uni /= uni.sum()
    order = rng.permutation(n_words)
    uni = uni[np.argsort(order)]  # random assignment of ranks to ids
    avg_succ = max(2, n_bigrams // (n_words + 1))
    succ_ids = {}
    succ_logp = {}
    total_bi = 0
    names = [f"w{i}" for i in range(n_words)] + ["<s>", "</s>"]
    SB, SE = n_words, n_words + 1  # <s>, </s> pseudo-ids

    def draw_successors(k):
        # favor frequent words as successors (Zipf-weighted sample)
        ids = rng.choice(n_words, size=min(k, n_words), replace=False, p=uni)
        return np.sort(ids)

    for w in list(range(n_words)) + [SB]:
        k = int(np.clip(rng.lognormal(math.log(avg_succ), 0.6), 2, n_words))
        ids = draw_successors(k)
        p = rng.dirichlet(np.ones(len(ids)) * 0.5) * 0.9
        # every word can end the sentence with the leftover mass
        succ_ids[w] = np.concatenate([ids, [SE]])
        succ_logp[w] = np.log10(np.concatenate([p, [0.1]]))
        total_bi += len(ids) + 1

    with open(os.path.join(cache, "lm.arpa"), "w") as fd:
        fd.write(f"\\data\\\nngram 1={n_words + 2}\nngram 2={total_bi}\n\n")
        fd.write("\\1-grams:\n")
        fd.write("-99 <s> -0.5\n")
        fd.write(f"{log10(0.02):.4f} </s>\n")
        for w in range(n_words):
            fd.write(f"{log10(uni[w] * 0.98):.4f} w{w} -0.5\n")
        fd.write("\n\\2-grams:\n")
        for w in list(range(n_words)) + [SB]:
            wn = names[w]
            for i, s in enumerate(succ_ids[w]):
                fd.write(f"{succ_logp[w][i]:.4f} {wn} {names[s]}\n")
        fd.write("\n\\end\\\n")

    np.savez_compressed(
        os.path.join(cache, "bigram.npz"),
        **{f"ids_{w}": succ_ids[w] for w in succ_ids},
        **{f"logp_{w}": succ_logp[w] for w in succ_logp},
    )
    return phones


def build_models(cache, phones, n_emit, n_comps, vec_size, center_scale, seed,
                 fname="models.npz"):
    from juicer_tpu.am import AcousticModelSet
    from juicer_tpu.am.mmf import MmfDef, MmfHmm, MmfMixture, MmfState, MmfTransMat

    rng = np.random.default_rng(seed + 1)
    d = MmfDef()
    d.global_opts.vec_size = vec_size
    n = n_emit + 2
    for name in phones + ["sil", "sp"]:
        probs = np.zeros((n, n))
        probs[0, 1] = 1.0
        if name == "sp":
            probs[0, 1] = 0.3
            probs[0, n - 1] = 0.7  # tee
        for i in range(1, n - 1):
            probs[i, i] = 0.6
            probs[i, i + 1] = 0.4
        center = rng.normal(scale=center_scale, size=vec_size)
        states = [
            MmfState(mixtures=[
                MmfMixture(1.0 / n_comps,
                           center + rng.normal(scale=1.0, size=vec_size),
                           np.abs(rng.normal(size=vec_size)) * 0.5 + 0.8)
                for _ in range(n_comps)])
            for _ in range(n_emit)
        ]
        d.hmms.append(MmfHmm(name, n, states, MmfTransMat(None, n, probs)))
    ms = AcousticModelSet.from_def(d)
    ms.save_npz(os.path.join(cache, fname))
    return ms


def ensure_models(cache, center_scale=1.2, n_emit=3, n_comps=8, vec_size=39,
                  seed=7):
    """Models at an alternate GMM separability, sharing the cached task's
    topology/transitions (so the cached network + artifact stay valid —
    `center_scale` only scales how far apart the per-phone GMM centers
    are drawn; lower = more confusable = harder acoustics, used for the
    accuracy-degradation curve VERDICT r4 item 2)."""
    from juicer_tpu.am import AcousticModelSet

    if abs(center_scale - 1.2) < 1e-9:
        return AcousticModelSet.load_npz(os.path.join(cache, "models.npz"))
    fname = f"models_cs{center_scale:g}.npz"
    path = os.path.join(cache, fname)
    if os.path.exists(path):
        return AcousticModelSet.load_npz(path)
    phones = []
    with open(os.path.join(cache, "phones.lst")) as fd:
        for line in fd:
            p = line.strip()
            if p and p not in ("sil", "sp"):
                phones.append(p)
    return build_models(cache, phones, n_emit, n_comps, vec_size,
                        center_scale, seed, fname=fname)


def mismatch_models(models, sigma, seed=23):
    """Train/test mismatch: a DECODING model set whose GMM means are
    perturbed by sigma·N(0,1) relative to the generating models (mixture
    stds are ~1.0). Features synthesized from the clean models then score
    noisily under these, so the true path is no longer always locally
    best and pruning genuinely costs words — the regime the reference's
    WSJ accuracy-vs-speed study lives in (juicer_userman.tex:606-673);
    with matched models the synthetic true path is essentially
    unbeatable and every beam measures 100 % (PERF.md R5.4). Topology
    and transitions are untouched, so networks and artifacts stay
    valid."""
    import copy

    if sigma <= 0:
        return models
    rng = np.random.default_rng(seed)
    m2 = copy.copy(models)
    m2.gmm_means = [
        np.asarray(mu) + rng.normal(scale=sigma, size=np.shape(mu))
        for mu in models.gmm_means
    ]
    return m2


def ensure_artifact(cache, net, models, verbose=True):
    """Load the derived decode artifact, rebuilding the npz cache when
    missing (it is derivable from clg.npz + models.npz; ~20 min CPU at
    20k words — untracked in git by design)."""
    from juicer_tpu.decoder.artifact import DecoderArtifact

    t0 = time.time()
    art_npz = os.path.join(cache, "artifact.npz")
    if os.path.exists(art_npz):
        art = DecoderArtifact.load_npz(art_npz, net, models)
        if verbose:
            print(f"[artifact] {art} (cached, {time.time()-t0:.1f}s)",
                  flush=True)
    else:
        art = DecoderArtifact(net, models)
        art.save_npz(art_npz)
        if verbose:
            print(f"[artifact] {art} ({time.time()-t0:.1f}s)", flush=True)
    return art


def steady_bench(art, cfg, db, batch_sizes, unroll=0, g_network=None):
    """Steady-state batched throughput at `cfg` (diagnostics off). `db`
    is a (B, T, n_gmms) score batch; each requested batch size tiles it.
    Returns {Bs: {"fps", "overflow", "compile_s"}} — overflow is counted
    from the benched program itself so an uncertified batch row can't
    pass silently (advisor r4). Pass `g_network` to bench the
    on-the-fly (CL ∘ G) decoder."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from juicer_tpu.decoder.tpu_core import TpuDecoder

    fast = TpuDecoder(art, dataclasses.replace(
        cfg, emit_diagnostics=False, scan_unroll=unroll),
        g_network=g_network)

    def one(dev, s):
        saved = fast.dev
        fast.dev = dev
        try:
            carry, ys, rec0 = fast._decode_scan(s.astype(fast._dt))
        finally:
            fast.dev = saved
        return carry["best_final"]["score"], carry["overflow"]

    fj = jax.jit(jax.vmap(one, in_axes=(None, 0)))
    B, Tmax = db.shape[0], db.shape[1]
    out = {}
    for Bs in batch_sizes:
        reps = (Bs + B - 1) // B
        dbs = jnp.concatenate([db] * reps, axis=0)[:Bs]
        t0 = time.time()
        sc, ov = fj(fast.dev, dbs)
        sc.block_until_ready()
        compile_s = round(time.time() - t0, 1)
        t0 = time.time()
        sc, ov = fj(fast.dev, dbs)
        sc.block_until_ready()
        dt = time.time() - t0
        out[Bs] = {
            "fps": round(Bs * Tmax / dt, 1),
            "overflow": int(np.sum(np.asarray(ov))),
            "compile_s": compile_s,
        }
    return out


def ensure_task(cache, n_words, n_bigrams, n_phones=45, n_emit=3, n_comps=8,
                vec_size=39, center_scale=1.2, seed=7):
    """Build (or load) the cached task: CLG network + models + bigrams."""
    from juicer_tpu.am import AcousticModelSet
    from juicer_tpu.compile import (CDGen, CDPhoneLookup, CDType, GramGen,
                                    GramType, LexGen, build_clg)
    from juicer_tpu.decoder.network import DecoderNetwork
    from juicer_tpu.lexicon import Lexicon

    net_npz = os.path.join(cache, "clg.npz")
    if os.path.exists(net_npz):
        print(f"[task] loading cached network {net_npz}", flush=True)
        net = DecoderNetwork.load_npz(net_npz)
        models = AcousticModelSet.load_npz(os.path.join(cache, "models.npz"))
        return net, models

    t0 = time.time()
    phones = gen_task_files(cache, n_words, n_bigrams, n_phones, seed)
    print(f"[task] files written ({time.time()-t0:.1f}s)", flush=True)

    lexicon = Lexicon.load(
        os.path.join(cache, "phones.lst"), os.path.join(cache, "lex.dict"),
        sil_phone="sil", pause_phone="sp",
        sent_start_word="<s>", sent_end_word="</s>", spec_word_char="",
    )
    t0 = time.time()
    G = GramGen(lexicon.vocab, GramType.NGRAM,
                lm_fname=os.path.join(cache, "lm.arpa")).build()
    print(f"[task] G: {G.num_states} states {G.num_arcs} arcs "
          f"({time.time()-t0:.1f}s)", flush=True)
    t0 = time.time()
    lexgen = LexGen(lexicon)
    L = lexgen.build(output_aux_phones=True)
    all_phones = phones + ["sil", "sp"]
    lookup = CDPhoneLookup(lexicon.phone_set)
    lookup.add_phones(all_phones)
    lookup.bind_models(all_phones)
    C = CDGen(CDType.MONOPHONE, lookup, all_phones,
              n_aux_syms=lexgen.n_aux).build()
    print(f"[task] L: {L.num_arcs} arcs, C: {C.num_arcs} arcs "
          f"({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    clg = build_clg(G, L, C, verbose=True).clg
    print(f"[task] CLG: {clg.num_states} states {clg.num_arcs} arcs "
          f"({time.time()-t0:.1f}s)", flush=True)

    net = DecoderNetwork(clg, clg.isyms, clg.osyms)
    net.save_npz(net_npz)
    models = build_models(cache, phones, n_emit, n_comps, vec_size,
                          center_scale, seed)
    return net, models


def sample_utterances(cache, models, lexicon_files, n_utts, target_frames,
                      seed, frames_per_state=3, free_text=False):
    """Random-walk the bigram, synthesize features from the models.

    `free_text=True` draws the word sequence UNIFORMLY instead (still
    decodable: the synthetic ARPA has unigram backoff, so G accepts any
    pair at a penalty). LM-likely transcripts make the LM an ally of the
    truth — with them, even severely mismatched acoustics decode at
    100 % (PERF.md R5.4); free text puts the LM in genuine tension with
    the acoustics, which is where WER and the accuracy-vs-pruning
    tradeoff actually live."""
    rng = np.random.default_rng(seed)
    bz = np.load(os.path.join(cache, "bigram.npz"))
    # lexicon: word -> phone ids
    phones_path, lex_path = lexicon_files
    phone_index = {}
    with open(phones_path) as fd:
        for i, line in enumerate(fd):
            phone_index[line.strip()] = i
    prons = {}
    with open(lex_path) as fd:
        for line in fd:
            parts = line.split()
            prons[parts[0]] = [phone_index[p] for p in parts[1:]]
    hmm_of_phone = {p: models.get_hmm_index(name)
                    for name, p in phone_index.items()}

    n_words_total = len(prons) - 2
    SB, SE = n_words_total, n_words_total + 1

    def frames_of(w):
        return (len(prons[f"w{w}"]) * (models.get_num_states(0) - 2)
                * frames_per_state)

    def sample_sentence():
        # ONE sentence <s> w... </s>: the grammar has no sentence loop, so
        # an utterance must be a single LM sentence or the audio is not in
        # G's language at all (the decoder would garble the joins)
        words, w, frames_est = [], SB, 0
        if free_text:
            while frames_est < target_frames * 0.9:
                w = int(rng.integers(n_words_total))
                words.append(w)
                frames_est += frames_of(w)
            return words, frames_est
        while True:
            ids = bz[f"ids_{w}"]
            logp = bz[f"logp_{w}"]
            p = 10.0 ** logp
            p /= p.sum()
            w = int(rng.choice(ids, p=p))
            if w == SE:
                return words, frames_est
            words.append(w)
            frames_est += frames_of(w)

    utts = []
    for _ in range(n_utts):
        best = None
        for _try in range(300):
            words, frames_est = sample_sentence()
            if not words:
                continue
            err = abs(frames_est - target_frames)
            if best is None or err < best[0]:
                best = (err, words)
            if target_frames * 0.6 <= frames_est <= target_frames * 1.5:
                break
        words = best[1]
        # features: sil + words + sil
        frames = []
        phone_seq = prons["<s>"] + sum((prons[f"w{w}"] for w in words), []) \
            + prons["</s>"]
        for p in phone_seq:
            h = hmm_of_phone[p]
            n = models.get_num_states(h)
            for j in range(1, n - 1):
                g = int(models.hmm_gmm_inds[h][j - 1])
                c = rng.integers(len(models.gmm_means[g]))
                mu = models.gmm_means[g][c]
                sd = np.sqrt(models.gmm_vars[g][c])
                for _ in range(max(1, frames_per_state + int(rng.integers(-1, 2)))):
                    frames.append(mu + rng.normal(size=len(mu)) * sd)
        utts.append((words, np.asarray(frames, dtype=np.float32)))
    return utts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small-scale validation run (2k words)")
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--words", type=int, default=20000)
    ap.add_argument("--bigrams", type=int, default=1_500_000)
    # default pruning = the conservative certified operating point from
    # the combined-pruning ladder (PERF.md R4.3b): 100% word accuracy,
    # zero overflow, 66x RT. `--beam 70 --end-beam 50 --maxhyps 500`
    # reaches 102.8x RT (still 100% acc on this task); the wide
    # zero-loss point (160/120/8000, 4.4x RT) is also reproducible.
    ap.add_argument("--beam", type=float, default=85.0)
    ap.add_argument("--end-beam", type=float, default=60.0)
    ap.add_argument("--maxhyps", type=int, default=800)
    ap.add_argument("--unroll", type=int, default=4,
                    help="frame-loop unroll for the steady bench")
    ap.add_argument("--merge", type=str, default="auto",
                    help="merge_strategy: auto|dense|sort")
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--cache", type=str, default=None)
    ap.add_argument("--no-tune", action="store_true",
                    help="use --K/--E as the exact budgets (certified "
                         "elsewhere)")
    ap.add_argument("--lattice", action="store_true",
                    help="generate word lattices at the tuned point for "
                         "every eval utterance: record counts, host "
                         "assembly time, size, best-path==1-best, and "
                         "transcript (oracle) coverage")
    ap.add_argument("--no-parity", action="store_true")
    ap.add_argument("--parity-only", action="store_true",
                    help="run ONLY the f64 oracle parity check (separate "
                         "process: f64 device tables replace the f32 ones)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--K", type=int, default=4096,
                    help="autotune base frontier budget (probe start)")
    ap.add_argument("--E", type=int, default=8192,
                    help="autotune base expansion budget (probe start)")
    args = ap.parse_args()

    if args.quick:
        args.words, args.bigrams = 2000, 100_000
        args.frames = min(args.frames, 300)
        args.batch = min(args.batch, 4)
    cache = args.cache or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"_wsj_cache_{args.words // 1000}k")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from juicer_tpu.decoder.autotune import autotune_budgets
    from juicer_tpu.decoder.tpu_core import TpuDecoder, TpuDecoderConfig
    from juicer_tpu.decoder.ref_core import RefDecoder
    from juicer_tpu.ops.gmm import make_gmm_scorer

    net, models = ensure_task(cache, args.words, args.bigrams)
    print(f"[net] {net.n_states} states, {net.n_arcs} arcs; "
          f"{models.n_hmms} hmms / {models.n_gmms} gmms", flush=True)
    if args.build_only:
        return

    art = ensure_artifact(cache, net, models)

    # utterances (plus two naturally SHORT ones for oracle parity: they
    # must end near </s> so the final state is reachable and words exist)
    utts = sample_utterances(
        cache, models,
        (os.path.join(cache, "phones.lst"), os.path.join(cache, "lex.dict")),
        n_utts=args.batch, target_frames=args.frames, seed=11)
    utts += sample_utterances(
        cache, models,
        (os.path.join(cache, "phones.lst"), os.path.join(cache, "lex.dict")),
        n_utts=2, target_frames=150, seed=12)
    scorer = make_gmm_scorer(models.flat_params())
    scores = [np.asarray(scorer(jnp.asarray(f))) for _, f in utts]
    print(f"[utts] {len(utts)} utterances, T="
          f"{[s.shape[0] for s in scores]}", flush=True)

    base = TpuDecoderConfig(
        emit_prune_win=args.beam, phone_end_prune_win=args.end_beam,
        word_prune_win=args.end_beam, max_emit_hyps=args.maxhyps,
        max_insts=args.K, expand_budget=args.E, final_budget=1024,
        merge_strategy=args.merge,
    )
    import dataclasses as _dc

    if args.parity_only:
        # f64 engine vs f64 oracle on the held-out short utterances:
        # exact-tolerance conformance at full network scale
        pdec = TpuDecoder(art, _dc.replace(
            base, dtype="float64", emit_diagnostics=True))
        for i, ((words, _), sc) in enumerate(
                zip(utts[args.batch:], scores[args.batch:])):
            sc = sc.astype(np.float64)
            r_tpu = pdec.decode_scores(sc)
            ref = RefDecoder(
                net, models, phone_start_prune_win=0.0,
                emit_prune_win=base.emit_prune_win,
                phone_end_prune_win=base.phone_end_prune_win,
                word_prune_win=base.word_prune_win,
                max_emit_hyps=base.max_emit_hyps,
            )
            t0 = time.time()
            r_ref = ref.decode(score_fn=lambda t, g: float(sc[t, g]),
                               n_frames=sc.shape[0])
            assert r_ref.words == r_tpu.words, (
                "PARITY FAIL", i, r_ref.words, r_tpu.words)
            assert abs(r_ref.score - r_tpu.score) < 1e-6, (i, r_ref.score,
                                                           r_tpu.score)
            print(f"[parity-f64] utt {i}: {len(r_ref.words)} words exact, "
                  f"score diff {abs(r_ref.score - r_tpu.score):.2e} "
                  f"(oracle {time.time()-t0:.1f}s)", flush=True)
        return

    t0 = time.time()
    if args.no_tune:
        tuned = base
        print(f"[budgets] K={tuned.max_insts} E={tuned.expand_budget} "
              f"(--no-tune; overflow still counted downstream)", flush=True)
    else:
        # certify over the WHOLE batch: 2-sample certification left 1/8
        # utterances overflowing on the first full run (PERF.md R4.3)
        tuned = autotune_budgets(art, scores[: args.batch], base,
                                 margin=1.4, verbose=True)
        print(f"[autotune] K={tuned.max_insts} E={tuned.expand_budget} "
              f"({time.time()-t0:.1f}s)", flush=True)

    # observability + accuracy over the batch. Output labels are
    # vocab-index+1 and the vocab is SORTED, so map ground-truth word ids
    # through the vocab; sentence markers are stripped like -rms
    import dataclasses

    from juicer_tpu.harness.editdist import EditDistance
    from juicer_tpu.lexicon import Lexicon

    lexicon = Lexicon.load(
        os.path.join(cache, "phones.lst"), os.path.join(cache, "lex.dict"),
        sil_phone="sil", pause_phone="sp",
        sent_start_word="<s>", sent_end_word="</s>", spec_word_char="",
    )
    vocab = lexicon.vocab
    marker_labels = {vocab.sent_start_index + 1, vocab.sent_end_index + 1}
    label_of = {w: vocab.get_index(f"w{w}") + 1 for w in range(args.words)}

    dec = TpuDecoder(art, dataclasses.replace(tuned, emit_diagnostics=True))
    ed = EditDistance()
    results = []
    for (words, _), sc in zip(utts[: args.batch], scores[: args.batch]):
        r = dec.decode_scores(sc)
        results.append(r)
        hyp = [w for w in r.words if w not in marker_labels]
        ref = [label_of[w] for w in words]
        ed.distance(hyp, ref)
    acc = ed.accuracy
    avg_act = np.mean([r.avg_active for r in results])
    max_act = max(r.max_active for r in results)
    summ = ed.summary().replace(chr(10), "; ")
    print(f"[accuracy] {summ}; "
          f"avg active {avg_act:.0f}, peak {max_act}, overflow "
          f"{sum(r.overflow for r in results)}/{len(results)}", flush=True)

    if args.lattice:
        # reference-scale lattice generation (VERDICT r4 item 4a): the
        # (T, E) edge-record stream at certified budgets, assembled on
        # the host; best path must reproduce the 1-best and the lattice
        # must contain the generating transcript (oracle coverage)
        from juicer_tpu.decoder.lattice import (build_lattice,
                                                contains_cost,
                                                shortest_path)

        B = args.batch
        # emit_diagnostics=True keeps _traceback on the conformance-tested
        # path whose reported score is the ABSOLUTE path total (the
        # diagnostics-off fast path reports the normalized carry score,
        # which cannot be compared against the raw cumulative lattice
        # costs)
        lat_dec = TpuDecoder(art, dataclasses.replace(
            tuned, gen_lattice=True, emit_diagnostics=True))
        tot = dict(events=0, edges=0, states=0, arcs=0, dev_s=0.0,
                   host_s=0.0, covered=0, best_ok=0)
        for i, ((words, _), sc) in enumerate(zip(utts[:B], scores[:B])):
            # edge-pad T to a 128 bucket so the 8 utterances share ~2
            # compiled programs (the padded tail repeats the closing sil
            # frames; the lattice is of the padded utterance, checked
            # self-consistently below)
            T_pad = -(-sc.shape[0] // 128) * 128
            sc = np.pad(sc, ((0, T_pad - sc.shape[0]), (0, 0)), mode="edge")
            t0 = time.time()
            dev_sc = jnp.asarray(sc, lat_dec._dt)
            carry, ys, rec0 = lat_dec._decode_jit(dev_sc)
            jax.block_until_ready(ys)
            t_dev = time.time() - t0
            T = sc.shape[0]
            res = lat_dec._traceback(carry, ys, rec0, T)
            t0 = time.time()
            lat = build_lattice(art, ys, rec0, T)
            t_host = time.time() - t0
            n_ev = int(np.sum(np.asarray(rec0["ev_arc"]) >= 0)) + int(
                np.sum(np.asarray(ys["ev_arc"]) >= 0))
            n_edge = int(np.sum(np.asarray(ys["lat_valid"])))
            cost, labs = shortest_path(lat)
            words_ok = labs == list(res.words)
            # lattice edge costs are ABSOLUTE cumulative (ac+lm); the
            # comparable 1-best total is acoustic_score + lm_score, not
            # the normalized res.score (same convention as
            # tests/test_lattice.py). f32 cumulative sums over ~10^3
            # frames at |score|~60/frame wobble in the last digits:
            # tolerance scales with T.
            abs_best = res.acoustic_score + res.lm_score
            best_ok = words_ok and abs(-cost - abs_best) < 1e-4 * max(T, 1)
            ref_seq = ([vocab.sent_start_index + 1]
                       + [label_of[w] for w in words]
                       + [vocab.sent_end_index + 1])
            ccost = contains_cost(lat, ref_seq)
            covered = np.isfinite(ccost)
            print(f"[lattice] utt {i}: T={T} events={n_ev} edges={n_edge} "
                  f"-> {lat.num_states} states / {lat.num_arcs} arcs; "
                  f"device {t_dev:.1f}s, host assembly {t_host:.1f}s; "
                  f"best-path {'OK' if best_ok else 'MISMATCH'} "
                  f"(words {'ok' if words_ok else 'DIFF'}, cost {cost:.1f} "
                  f"vs 1-best {-abs_best:.1f}); "
                  f"transcript {'covered (cost %.1f)' % ccost if covered else 'NOT COVERED'}",
                  flush=True)
            tot["events"] += n_ev
            tot["edges"] += n_edge
            tot["states"] += lat.num_states
            tot["arcs"] += lat.num_arcs
            tot["dev_s"] += t_dev
            tot["host_s"] += t_host
            tot["covered"] += int(covered)
            tot["best_ok"] += int(best_ok)
        print(f"[lattice] TOTAL {B} utts: {tot['events']} events, "
              f"{tot['edges']} edges, {tot['states']} states / "
              f"{tot['arcs']} arcs; device {tot['dev_s']:.1f}s, host "
              f"{tot['host_s']:.1f}s; best-path {tot['best_ok']}/{B}, "
              f"coverage {tot['covered']}/{B}", flush=True)

    # steady-state batched throughput (pad to common length)
    B = args.batch
    Tmax = max(s.shape[0] for s in scores[:B])
    batch_sc = np.stack([
        np.pad(s, ((0, Tmax - s.shape[0]), (0, 0)), mode="edge")
        for s in scores[:B]
    ])
    db = jnp.asarray(batch_sc, jnp.float32)
    sb = steady_bench(art, tuned, db, [B], unroll=args.unroll)[B]
    fps = sb["fps"]
    print(f"[bench] steady batch={B}: {fps:.0f} frames/s/chip = "
          f"{fps/100:.1f}x RT (compile {sb['compile_s']}s, overflow "
          f"{sb['overflow']}/{B})", flush=True)

    if not args.no_parity:
        # oracle parity on the two held-out (short) utterances. The f64
        # oracle decodes the same scores; the engine side reuses the f32
        # diagnostics decoder (an f64 twin would double the multi-GB
        # device entry table at WSJ scale), so scores compare at f32
        # accumulation tolerance while words must be identical.
        for i, ((words, _), sc) in enumerate(
                zip(utts[args.batch:], scores[args.batch:])):
            r_tpu = dec.decode_scores(sc)
            ref = RefDecoder(
                net, models,
                phone_start_prune_win=0.0,
                emit_prune_win=tuned.emit_prune_win,
                phone_end_prune_win=tuned.phone_end_prune_win,
                word_prune_win=tuned.word_prune_win,
                max_emit_hyps=tuned.max_emit_hyps,
            )
            t0 = time.time()
            r_ref = ref.decode(score_fn=lambda t, g: float(sc[t, g]),
                               n_frames=sc.shape[0])
            if r_ref.words == r_tpu.words:
                print(f"[parity] utt {i}: {len(r_ref.words)} words exact "
                      f"(f32 engine vs f64 oracle; oracle "
                      f"{time.time()-t0:.1f}s)", flush=True)
            else:
                # f32 accumulation can flip near-ties on a 20k-word
                # network; the exact-tolerance check is --parity-only
                # (f64 engine). Report, don't fail here.
                print(f"[parity] utt {i}: f32 engine diverges from f64 "
                      f"oracle ({r_tpu.words} vs {r_ref.words}) — run "
                      f"--parity-only for the f64 check", flush=True)

    print(json.dumps({
        "metric": "wsj_e2e_frames_per_sec_chip", "value": round(fps, 1),
        "unit": "frames/s/chip", "n_arcs": int(net.n_arcs),
        "K": tuned.max_insts, "E": tuned.expand_budget,
        "accuracy": round(acc, 4), "xRT": round(fps / 100, 1),
    }))


if __name__ == "__main__":
    main()
