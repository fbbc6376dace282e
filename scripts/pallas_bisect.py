"""Compile-bisect the fused decode kernel on the TPU via debug_stage cuts."""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from juicer_tpu.utils.synth import make_synth_task
    from juicer_tpu.decoder.tpu_core import TpuDecoder, TpuDecoderConfig
    from juicer_tpu.decoder.pallas_scan import PallasDecodeScan

    task = make_synth_task(n_words=30, n_phones=16, vec_size=20, n_comps=8,
                           seed=0)
    cfg = TpuDecoderConfig(max_insts=128, expand_budget=256, final_budget=128,
                           emit_diagnostics=False, emit_prune_win=150.0,
                           phone_end_prune_win=75.0)
    dec = TpuDecoder(task.artifact, cfg)
    B, T = 8, 8
    rng = np.random.default_rng(0)
    scores = jnp.asarray(
        rng.normal(size=(T, B, task.models.n_gmms)), jnp.float32)

    stages = [int(a) for a in sys.argv[1:] if not a.startswith("-")] or (
        list(range(1, 9)) + [0])
    for stage in stages:
        ps = PallasDecodeScan(dec, B, chunk=T, debug_stage=stage)
        t0 = time.perf_counter()
        try:
            carry, ys = ps(scores)
            jax.block_until_ready(carry)
            print(f"stage {stage}: PASS {time.perf_counter() - t0:.1f}s",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"stage {stage}: FAIL {time.perf_counter() - t0:.1f}s {msg}",
                  flush=True)
            if "--full" in sys.argv:
                import traceback
                traceback.print_exc()


if __name__ == "__main__":
    main()
