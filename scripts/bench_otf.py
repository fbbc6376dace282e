"""On-the-fly composition decode throughput on the real TPU, next to the
static-CLG number (round-2 review item #6: "publish OTF frames/s next to
the static number").

Same generator family as bench.py (word-loop task, diagonal-GMM HMMs):
the static path decodes det(C∘L∘G); the OTF path searches CL with G
intersected lazily per word crossing (vectorized packed-row G advance,
decoder/tpu_core._g_advance), with and without label-and-weight pushing.

Usage: python scripts/bench_otf.py [--quick]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(n_words, n_phones, vec):
    from juicer_tpu.utils import synth
    from juicer_tpu.fst import algos
    from juicer_tpu.compile import (
        CDGen, CDPhoneLookup, CDType, GramGen, GramType, LexGen)
    from juicer_tpu.decoder import DecoderNetwork
    from juicer_tpu.decoder.otf import GNetwork

    task = synth.make_synth_task(
        n_words=n_words, n_phones=n_phones, vec_size=vec, n_comps=8, seed=0
    )
    lex = task.lexicon
    G = GramGen(lex.vocab, GramType.WORDLOOP).build()
    lg = LexGen(lex)
    L = lg.build(output_aux_phones=True)
    lookup = CDPhoneLookup(lex.phone_set)
    lookup.add_phones(list(lex.phone_set.phones))
    lookup.bind_models(list(lex.phone_set.phones))
    C = CDGen(CDType.MONOPHONE, lookup, list(lex.phone_set.phones),
              n_aux_syms=lg.n_aux).build()
    cl = algos.compose(C, algos.closure(algos.arcsort(L)))
    cl.isyms, cl.osyms = C.isyms, L.osyms
    cl_net = DecoderNetwork(cl, C.isyms, L.osyms, remove_aux="input")
    return task, cl_net, GNetwork(G)


def main():
    import jax
    import jax.numpy as jnp

    from juicer_tpu.decoder.artifact import DecoderArtifact
    from juicer_tpu.decoder.tpu_core import TpuDecoder, TpuDecoderConfig
    from juicer_tpu.ops.gmm import make_gmm_scorer

    quick = "--quick" in sys.argv
    if quick:
        n_words, n_phones, vec, B, T, iters = 30, 16, 20, 8, 128, 2
    else:
        n_words, n_phones, vec, B, T, iters = 200, 40, 39, 128, 1000, 5

    task, cl_net, g_net = build(n_words, n_phones, vec)
    art = DecoderArtifact(cl_net, task.models)
    scorer = make_gmm_scorer(task.models.flat_params())
    beams = dict(emit_prune_win=150.0, phone_end_prune_win=75.0)

    rng = np.random.default_rng(1)
    words = [f"w{i}" for i in range(n_words)]
    distinct = []
    for _ in range(min(B, 4)):
        seq = [words[rng.integers(n_words)] for _ in range(max(2, T // 60))]
        f = task.synth_utterance(seq, rng)
        f = f[:T] if f.shape[0] >= T else np.concatenate(
            [f, np.tile(f[-1:], (T - f.shape[0], 1))])
        distinct.append(f)
    feats = jnp.asarray(
        np.stack([distinct[i % len(distinct)] for i in range(B)]), jnp.float32)

    def bench(dec, name):
        def one(scores):
            carry, ys, rec0 = dec._decode_scan(scores.astype(dec._dt))
            return carry["best_final"]["score"]

        @jax.jit
        def step(features):
            Bf, Tf, Df = features.shape
            scores = scorer(features.reshape(Bf * Tf, Df))
            return jax.jit(jax.vmap(one))(scores.reshape(Bf, Tf, -1))

        t0 = time.perf_counter()
        out = step(feats)
        out.block_until_ready()
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(feats)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        fps = B * T * iters / dt
        print(f"{name}: {fps:,.0f} frames/s ({dt / iters * 1e3:.1f} ms/iter)",
              flush=True)
        # certification: diagnostics decode of each distinct utterance
        import dataclasses

        diag = TpuDecoder(
            art, dataclasses.replace(dec.cfg, emit_diagnostics=True),
            g_network=g_net)
        for f in distinct:
            r = diag.decode_scores(
                np.asarray(scorer(jnp.asarray(f, jnp.float32))))
            if r.overflow or not r.words:
                print(f"{name}: WARNING budget overflow/empty "
                      f"(peak {r.max_active}/{r.max_cand})", flush=True)
                break
        return fps

    K, E = 256, 512
    base = dict(max_insts=K, expand_budget=E, final_budget=128,
                emit_diagnostics=False, scan_unroll=16, **beams)
    otf = TpuDecoder(art, TpuDecoderConfig(**base), g_network=g_net)
    bench(otf, "otf          ")
    pushed = TpuDecoder(art, TpuDecoderConfig(otf_pushing=True, **base),
                        g_network=g_net)
    bench(pushed, "otf (pushing)")


if __name__ == "__main__":
    main()
