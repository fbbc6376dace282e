"""A/B: XLA scan vs the fused Pallas kernel vmapped over 8-row batch
groups (B=8 kernel + vmap -> grid dimension), at bench.py's full operating
point. The direct B=128 kernel build hits a Mosaic compile wall (>30 min,
3x reproduced); vmap keeps the program at the B=8 size while the grid
covers all groups.

Usage: python scripts/ab_pallas_group.py [--B=128] [--T=1024] [--no-xla]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from juicer_tpu.utils.synth import make_synth_task
    from juicer_tpu.decoder.tpu_core import TpuDecoder, TpuDecoderConfig
    from juicer_tpu.decoder.pallas_scan import PallasDecodeScan
    from juicer_tpu.ops.gmm import make_gmm_scorer

    n_words, n_phones, vec, B, T, iters = 200, 40, 39, 128, 1024, 5
    GB = 8  # kernel batch (one sublane group)
    for a in sys.argv[1:]:
        if a.startswith("--B="):
            B = int(a[4:])
        if a.startswith("--T="):
            T = int(a[4:])
        if a.startswith("--GB="):
            GB = int(a[5:])
    skip_xla = "--no-xla" in sys.argv
    K, E = 128, 128

    task = make_synth_task(
        n_words=n_words, n_phones=n_phones, vec_size=vec, n_comps=8, seed=0
    )
    beams = dict(emit_prune_win=150.0, phone_end_prune_win=75.0)
    cfg = TpuDecoderConfig(max_insts=K, expand_budget=E, final_budget=128,
                           emit_diagnostics=False, **beams)
    dec = TpuDecoder(task.artifact, cfg)
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

    # ---- XLA path ----
    def one(scores):
        carry, ys, rec0 = dec._decode_scan(scores.astype(dec._dt))
        return carry["best_final"]["score"]

    decode_batch = jax.jit(jax.vmap(one))

    @jax.jit
    def step_xla(features):
        Bf, Tf, Df = features.shape
        scores = scorer(features.reshape(Bf * Tf, Df))
        return decode_batch(scores.reshape(Bf, Tf, -1))

    # ---- grouped Pallas path: GB-row kernel vmapped over B//GB groups ----
    assert B % GB == 0
    G = B // GB
    ps = PallasDecodeScan(dec, GB, chunk=128)
    run = ps.run_fn()

    def run_group(carry, scores_g):
        # scores_g: (T, GB, n_gmms)
        return run(carry, scores_g, jnp.int32(0))

    @jax.jit
    def step_pallas(features):
        Bf, Tf, Df = features.shape
        scores = scorer(features.reshape(Bf * Tf, Df))
        # (B, T, G) -> (groups, T, GB, G)
        s = scores.reshape(G, GB, Tf, -1).transpose(0, 2, 1, 3)
        init = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (G,) + x.shape), dict(ps.init)
        )
        carry, ys = jax.vmap(run_group)(init, s)
        return ys["bf_score"][:, -1]  # (groups, GB)

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

    sp, fp = bench(step_pallas, "pallas-grouped")
    if skip_xla:
        return
    sx, fx = bench(step_xla, "xla           ")
    print("final-score max|diff|:",
          float(np.abs(np.sort(sx.reshape(-1)) - np.sort(sp.reshape(-1))).max()))
    print(f"speedup: {fp / fx:.2f}x")


if __name__ == "__main__":
    main()
