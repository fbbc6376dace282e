"""A/B: lax.scan unroll factor for the decode frame loop, at bench.py's
full operating point. The frame step is ~60 small ops; per-iteration
dispatch/fusion-boundary overhead dominates at bench shapes, and scan
unrolling amortizes it (and lets XLA fuse across frames).

Usage: python scripts/ab_scan_unroll.py [unrolls...]
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
    from juicer_tpu.ops.gmm import make_gmm_scorer

    unrolls = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    n_words, n_phones, vec, B, T, iters = 200, 40, 39, 128, 1000, 5
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
    feats = jnp.asarray(
        rng.normal(scale=1.0, size=(B, T, vec)), jnp.float32
    )

    results = {}
    for u in unrolls:
        def one(scores, u=u):
            carry, rec0 = dec._init_carry()
            frame_in = {"gmm": scores, "t": jnp.arange(T, dtype=jnp.int32)}
            carry, ys = jax.lax.scan(dec._frame_step, carry, frame_in,
                                     unroll=u)
            return carry["best_final"]["score"]

        @jax.jit
        def step(features):
            Bf, Tf, Df = features.shape
            scores = scorer(features.reshape(Bf * Tf, Df))
            return jax.vmap(one)(scores.reshape(Bf, Tf, -1))

        t0 = time.perf_counter()
        out = step(feats)
        out.block_until_ready()
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(feats)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        fps = B * T * iters / dt
        results[u] = (fps, np.asarray(out))
        print(f"unroll={u}: {fps:,.0f} frames/s (compile {tc:.1f}s)",
              flush=True)
    base = results[unrolls[0]][1]
    for u in unrolls[1:]:
        d = float(np.abs(results[u][1] - base).max())
        print(f"unroll={u} vs {unrolls[0]}: max|score diff| {d}")


if __name__ == "__main__":
    main()
