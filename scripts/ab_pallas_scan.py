"""A/B the fused Pallas decode scan vs the XLA scan on the real TPU.

Same task/shapes as bench.py's full run. Prints frames/s for both paths
plus a correctness cross-check (identical 1-best words + final scores).
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from juicer_tpu.utils.synth import make_synth_task
    from juicer_tpu.decoder.tpu_core import TpuDecoder, TpuDecoderConfig
    from juicer_tpu.decoder.pallas_scan import (
        PallasDecodeScan, assemble_results, pallas_eligible)
    from juicer_tpu.ops.gmm import make_gmm_scorer

    quick = "--quick" in sys.argv
    if quick:
        n_words, n_phones, vec, B, T, iters = 30, 16, 20, 8, 128, 2
        K, E = 128, 256
    else:
        n_words, n_phones, vec, B, T, iters = 200, 40, 39, 128, 1024, 5
        K, E = 128, 128
    for a in sys.argv[1:]:
        if a.startswith("--B="):
            B = int(a[4:])
        if a.startswith("--T="):
            T = int(a[4:])
    skip_xla = "--no-xla" in sys.argv

    task = make_synth_task(
        n_words=n_words, n_phones=n_phones, vec_size=vec, n_comps=8, seed=0
    )
    beams = dict(emit_prune_win=150.0, phone_end_prune_win=75.0)
    cfg = TpuDecoderConfig(max_insts=K, expand_budget=E, final_budget=128,
                           emit_diagnostics=False, **beams)
    dec = TpuDecoder(task.artifact, cfg)
    print("pallas_eligible:", pallas_eligible(dec))
    scorer = make_gmm_scorer(task.models.flat_params())

    rng = np.random.default_rng(1)
    words = [f"w{i}" for i in range(n_words)]
    distinct = []
    for _ in range(min(B, 4)):
        seq = [words[rng.integers(n_words)] for _ in range(max(2, T // 60))]
        f = task.synth_utterance(seq, rng)
        if f.shape[0] >= T:
            f = f[:T]
        else:
            f = np.concatenate([f, np.tile(f[-1:], (T - f.shape[0], 1))])
        distinct.append(f)
    feats = np.stack([distinct[i % len(distinct)] for i in range(B)])
    feats = jnp.asarray(feats, jnp.float32)

    # ---- XLA path (bench.py's step) ----
    def one(scores):
        carry, ys, rec0 = dec._decode_scan(scores.astype(dec._dt))
        return carry["best_final"]["score"]

    decode_batch = jax.jit(jax.vmap(one))

    @jax.jit
    def step_xla(features):
        Bf, Tf, Df = features.shape
        scores = scorer(features.reshape(Bf * Tf, Df))
        return decode_batch(scores.reshape(Bf, Tf, -1))

    # ---- Pallas path ----
    ps = PallasDecodeScan(dec, B, chunk=128)

    @jax.jit
    def step_pallas(features):
        Bf, Tf, Df = features.shape
        scores = scorer(features.reshape(Bf * Tf, Df))
        scores = scores.reshape(Bf, Tf, -1).transpose(1, 0, 2)
        carry, ys = ps(scores)
        # same reduction as step_xla: the per-utterance final score
        return ys["bf_score"][-1]

    def bench(fn, name):
        t0 = time.perf_counter()
        out = fn(feats)
        out.block_until_ready()
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(feats)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        fps = B * T * iters / dt
        print(f"{name}: {fps:,.0f} frames/s  ({dt / iters * 1e3:.1f} ms/iter)")
        return np.asarray(out), fps

    if skip_xla:
        sp, fp = bench(step_pallas, "pallas")
        return
    sx, fx = bench(step_xla, "xla   ")
    sp, fp = bench(step_pallas, "pallas")
    print("final-score max|diff|:", float(np.abs(sx - sp).max()))
    print(f"speedup: {fp / fx:.2f}x")


if __name__ == "__main__":
    main()
