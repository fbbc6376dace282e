"""Headline benchmark: decoded audio frames / second / chip.

Runs the fused acoustic-scoring + frontier-search decoder on a synthetic
midsize task (word-loop CLG, diagonal-GMM HMMs) and measures sustained
decode throughput in audio frames per second per chip. The reference
baseline for `vs_baseline` is 100x real time at a 100 Hz frame rate
(10,000 frames/s/chip) — the BASELINE.json north-star target
(">100x real-time frames/s/chip").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    quick = "--quick" in sys.argv
    use_pallas = "--pallas" in sys.argv
    import jax
    import jax.numpy as jnp

    from juicer_tpu.utils.synth import make_synth_task
    from juicer_tpu.decoder.tpu_core import TpuDecoder, TpuDecoderConfig
    from juicer_tpu.ops.gmm import make_gmm_scorer

    if quick:
        n_words, n_phones, vec, B, T, iters = 30, 16, 20, 2, 100, 2
        K, E = 256, 1024
        if use_pallas:
            B, T = 8, 128
    else:
        # B=128 is the measured utilization sweet spot at this frontier
        # size (B=32: 112k, B=64: 122k, B=128: 137k, B=256: 104k fps)
        n_words, n_phones, vec, B, T, iters = 200, 40, 39, 128, 1000, 5
        # per-frame cost is dominated by the (K+E)-row co-sort (ablation
        # profile: scripts/profile_step.py), so budgets sit as low as the
        # in-run certification allows: measured peak 49 active insts / 48
        # candidates at these beams, certified non-binding below
        K, E = 128, 128

    task = make_synth_task(
        n_words=n_words, n_phones=n_phones, vec_size=vec, n_comps=8, seed=0
    )
    # Beam-pruned operating point, like the reference's published numbers
    # (WSJ pruning study, main beam 150-250: `juicer_userman.tex:606-673`).
    # On this corpus the beam is verified loss-free: 1-best output matches
    # the unpruned decode exactly (beam sweep 75-300, see git history), and
    # the budgets (autotuned: peak 49 active / 48 candidates at beam 150)
    # are certified by the overflow check below — if a budget ever bound,
    # the run aborts rather than report a pruned-result throughput.
    beams = dict(emit_prune_win=150.0, phone_end_prune_win=75.0)
    # scan_unroll=16: measured best on TPU at these shapes (173k -> 287k
    # frames/s, exact; PERF.md §4)
    cfg = TpuDecoderConfig(max_insts=K, expand_budget=E, final_budget=128,
                           emit_diagnostics=False, scan_unroll=16, **beams)
    dec = TpuDecoder(task.artifact, cfg)
    scorer = make_gmm_scorer(task.models.flat_params())

    def one(scores):
        carry, ys, rec0 = dec._decode_scan(scores.astype(dec._dt))
        return carry["best_final"]["score"]

    decode_batch = jax.jit(jax.vmap(one))

    if use_pallas:
        # the fused VMEM-resident decode scan (decoder/pallas_scan.py)
        from juicer_tpu.decoder.pallas_scan import PallasDecodeScan

        T = -(-T // 128) * 128  # chunked kernel: T must be a 128-multiple
        ps = PallasDecodeScan(dec, B, chunk=128)

        @jax.jit
        def step(features):
            Bf, Tf, Df = features.shape
            scores = scorer(features.reshape(Bf * Tf, Df))
            scores = scores.reshape(Bf, Tf, -1).transpose(1, 0, 2)
            carry, ys = ps(scores)
            return ys["bf_score"][-1]

    else:

        @jax.jit
        def step(features):
            # score the whole batch flat (Pallas kernel), then decode per
            # utterance
            Bf, Tf, Df = features.shape
            scores = scorer(features.reshape(Bf * Tf, Df))
            return decode_batch(scores.reshape(Bf, Tf, -1))

    # synthesize a real utterance batch (random word sequences); a few
    # distinct utterances tiled to B keeps setup time low
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

    # certification pass: decode each DISTINCT utterance (the batch tiles
    # these ≤4 utterances, so certifying them certifies every batch row)
    # with diagnostics on and assert no frontier/expansion budget ever
    # bound (overflow False => results are bit-identical to unbounded
    # budgets at these beams)
    import dataclasses

    diag = TpuDecoder(task.artifact, dataclasses.replace(cfg, emit_diagnostics=True))
    for f in distinct:
        r = diag.decode_scores(np.asarray(scorer(jnp.asarray(f, jnp.float32))))
        if r.overflow or not r.words:
            raise SystemExit(
                f"bench: budget overflow (peak {r.max_active}/{r.max_cand}) — "
                "throughput at these budgets would report pruned results"
            )

    # warm up (compile)
    out = step(feats)
    out.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(feats)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    frames = B * T * iters
    fps = frames / dt
    baseline = 10_000.0  # 100x real time per chip at 100 frames/s
    print(
        json.dumps(
            {
                "metric": "decoded audio frames/sec/chip",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
