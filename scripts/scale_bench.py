"""Scale validation: WSJ-order synthetic CLG through artifact + TPU decode.

Builds a random CLG-shaped network directly (states/arcs/eps-with-words
mimicking det(C∘det(L∘G)) statistics: the reference's WSJ 20k machine is
1.32M states / 5.41M arcs, `BASELINE.md`), runs the offline artifact
compilation (native closure), and measures beam-pruned decode throughput
with histogram pruning and realistic frontier sizes.

Usage: python scripts/scale_bench.py [n_arcs] [K] [E] [--batch B]
           [--merge dense|sort|auto] [--maxhyps N]

With --batch B the decode is vmapped over B parallel utterance streams
(the cluster-job-splitting equivalent, SURVEY.md §2.7, collapsed onto one
chip) and throughput is reported in aggregate frames/s/chip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_big_network(n_arcs=1_000_000, n_models=2000, n_words=20000, seed=0):
    from juicer_tpu.fst import Fst, LOG
    from juicer_tpu.decoder.network import DecoderNetwork

    rng = np.random.default_rng(seed)
    n_states = max(4, n_arcs // 4)
    src = rng.integers(0, n_states, n_arcs)
    dst = rng.integers(0, n_states, n_arcs)
    is_eps = rng.random(n_arcs) < 0.05
    il = np.where(is_eps, 0, rng.integers(1, n_models + 1, n_arcs))
    has_word = rng.random(n_arcs) < 0.12
    ol = np.where(has_word, rng.integers(1, n_words + 1, n_arcs), 0)
    w = rng.exponential(1.0, n_arcs)

    f = Fst(LOG)
    f.num_states = n_states
    f.arc_src = src.tolist()
    f.arc_dst = dst.tolist()
    f.arc_ilabel = il.tolist()
    f.arc_olabel = ol.tolist()
    f.arc_weight = w.tolist()
    f.start = 0
    for s in rng.integers(0, n_states, 50):
        f.set_final(int(s), 0.0)
    return DecoderNetwork(f)


def main():
    import jax
    import jax.numpy as jnp

    args = list(sys.argv[1:])
    B = 0
    merge = "auto"
    maxhyps = 8000
    if "--batch" in args:
        i = args.index("--batch")
        B = int(args[i + 1])
        del args[i : i + 2]
    if "--merge" in args:
        i = args.index("--merge")
        merge = args[i + 1]
        del args[i : i + 2]
    if "--maxhyps" in args:
        i = args.index("--maxhyps")
        maxhyps = int(args[i + 1])
        del args[i : i + 2]
    unroll = 0
    if "--unroll" in args:
        i = args.index("--unroll")
        unroll = int(args[i + 1])
        del args[i : i + 2]
    n_arcs = int(args[0]) if len(args) > 0 else 1_000_000
    K = int(args[1]) if len(args) > 1 else 8192
    E = int(args[2]) if len(args) > 2 else 32768

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_decoder import make_models
    from juicer_tpu.decoder.artifact import DecoderArtifact
    from juicer_tpu.decoder.tpu_core import TpuDecoder, TpuDecoderConfig

    n_models = 2000
    t0 = time.time()
    net = build_big_network(n_arcs=n_arcs, n_models=n_models)
    print(f"network: {net.n_states} states, {net.n_arcs} arcs ({time.time()-t0:.1f}s)")

    t0 = time.time()
    models = make_models(n_models, n_emit=3, dim=39, n_comps=8, seed=1)
    print(f"models: {models.n_hmms} hmms, {models.n_gmms} gmms ({time.time()-t0:.1f}s)")

    t0 = time.time()
    art = DecoderArtifact(net, models)
    print(f"artifact: {art} ({time.time()-t0:.1f}s, native={art._native is not None})")

    t0 = time.time()
    dec = TpuDecoder(
        art,
        TpuDecoderConfig(
            max_insts=K, expand_budget=E, final_budget=1024,
            emit_prune_win=150.0, phone_end_prune_win=120.0,
            word_prune_win=120.0, max_emit_hyps=maxhyps,
            merge_strategy=merge, scan_unroll=unroll,
        ),
    )
    print(f"decoder: K={dec.K} E={dec.E} merge={dec.merge_strategy} "
          f"maxhyps={maxhyps} unroll={dec.scan_unroll} "
          f"({time.time()-t0:.1f}s)")

    T = 500
    rng = np.random.default_rng(2)
    if B:
        scores = jnp.asarray(
            rng.normal(scale=3.0, size=(B, T, models.n_gmms)), jnp.float32
        )

        def one(s):
            carry, ys, rec0 = dec._decode_scan(s.astype(dec._dt))
            return carry["best_final"]["score"], carry["overflow"]

        f = jax.jit(jax.vmap(one))
        t0 = time.time()
        sc, ov = f(scores)
        sc.block_until_ready()
        print(f"decode compile+run: {time.time()-t0:.1f}s "
              f"(overflow: {int(np.sum(np.asarray(ov)))}/{B})")
        t0 = time.time()
        sc, ov = f(scores)
        sc.block_until_ready()
        dt = time.time() - t0
        print(f"decode steady (batch {B}): {dt:.2f}s = {B*T/dt:.0f} frames/s/chip "
              f"({dt/T*1e3:.2f} ms/frame-row)")
        return
    scores = jnp.asarray(rng.normal(scale=3.0, size=(T, models.n_gmms)), jnp.float32)
    t0 = time.time()
    res = dec.decode_scores(scores)
    print(f"decode compile+run: {time.time()-t0:.1f}s, {len(res.words)} words")
    t0 = time.time()
    res = dec.decode_scores(scores)
    dt = time.time() - t0
    print(f"decode steady: {dt:.2f}s = {T/dt:.0f} frames/s ({dt/T*1e3:.2f} ms/frame)")


if __name__ == "__main__":
    main()
