"""Ablation profile of the per-frame decode step at the bench config.

Times the full batched decode scan, then variants with individual frame-step
components stubbed out (results become wrong — this is a timing probe only),
to attribute per-frame cost. Run on the real TPU:

    python scripts/profile_step.py [B]
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
    from juicer_tpu.decoder import tpu_core
    from juicer_tpu.decoder.tpu_core import TpuDecoder, TpuDecoderConfig

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T, iters = 1000, 3
    task = make_synth_task(n_words=200, n_phones=40, vec_size=39, n_comps=8, seed=0)
    cfg = TpuDecoderConfig(
        max_insts=128, expand_budget=512, final_budget=128,
        emit_diagnostics=False, emit_prune_win=150.0, phone_end_prune_win=75.0,
    )
    dec = TpuDecoder(task.artifact, cfg)
    rng = np.random.default_rng(0)
    scores = jnp.asarray(
        rng.normal(scale=2.0, size=(B, T, task.models.n_gmms)), jnp.float32
    )

    def run(label):
        def one(s):
            carry, ys, rec0 = dec._decode_scan(s.astype(dec._dt))
            return carry["best_final"]["score"]

        f = jax.jit(jax.vmap(one))
        f(scores).block_until_ready()
        t0 = time.time()
        for _ in range(iters):
            r = f(scores)
        r.block_until_ready()
        dt = (time.time() - t0) / iters
        print(f"{label:36s} {dt*1e3:8.1f} ms  {B*T/dt:10.0f} fps")
        return dt

    base = run("full")

    # --- ablations: monkeypatch pieces of the step --------------------------
    orig_merge = TpuDecoder._merge_and_insert
    orig_expand = TpuDecoder._expand
    orig_finals = TpuDecoder._expand_finals

    # 1. skip the frontier-invariant restore sort inside merge (keep co-sort)
    import juicer_tpu.decoder.tpu_core as tc

    orig_sort = jax.lax.sort
    calls = {"n": 0}

    def count_sort(ops, **kw):
        calls["n"] += 1
        return orig_sort(ops, **kw)

    # count sorts per frame
    tc.jax.lax.sort = count_sort
    try:
        carry, _ = dec._init_carry()
        calls["n"] = 0
        dec._frame_step(carry, {"gmm": jnp.zeros((task.models.n_gmms,), dec._dt),
                                "t": jnp.int32(0)})
        print(f"lax.sort calls per frame: {calls['n']}")
    finally:
        tc.jax.lax.sort = orig_sort

    # 2. no co-sort: replace merge_and_insert with a cheap fake
    def fake_merge(self, fr, cand, t, norm):
        K = self.K
        dt = self._dt
        rec = {
            "prev": jnp.full((K,), -1, jnp.int32),
            "seq": jnp.zeros((K,), jnp.int32),
            "score": jnp.full((K,), tpu_core.NEG, dt),
            "ac": jnp.full((K,), tpu_core.NEG, dt),
            "lm": jnp.full((K,), tpu_core.NEG, dt),
            "n_active": jnp.int32(0),
        }
        # keep data dependency on cand so XLA can't DCE expansion
        best = jnp.max(cand["score"])
        fr = dict(fr)
        fr["score"] = fr["score"].at[0, 0].add(best * 0 + 1e-9)
        return fr, rec, best, jnp.asarray(False)

    TpuDecoder._merge_and_insert = fake_merge
    no_merge = run("no merge+insert (both sorts)")
    TpuDecoder._merge_and_insert = orig_merge

    # 3. no expansion (segment broadcast + entry gather); feed zero cands
    def fake_expand(self, src_score, src_ac, src_path, base, fan, live,
                    extra=()):
        E = self.E
        dt = self._dt
        dep = jnp.max(src_score) * 0
        return dict(
            arc=jnp.zeros((E,), jnp.int32),
            score=jnp.full((E,), tpu_core.NEG, dt) + dep,
            ac=jnp.full((E,), tpu_core.NEG, dt),
            prev=jnp.full((E,), -1, jnp.int32),
            seq=jnp.zeros((E,), jnp.int32),
            valid=jnp.zeros((E,), bool),
            overflow=jnp.asarray(False),
            n_cand=jnp.int32(0),
            extra=jnp.zeros((E, len(extra)), dt),
        )

    TpuDecoder._expand = fake_expand
    no_expand = run("no entry expansion")
    TpuDecoder._expand = orig_expand

    def fake_finals(self, src_score, src_ac, src_path, base, fan, live,
                    best, norm, extra=()):
        F = self.F
        dt = self._dt
        recs = {
            "score": jnp.full((F,), tpu_core.NEG, dt),
            "ac": jnp.full((F,), tpu_core.NEG, dt),
            "lm": jnp.full((F,), tpu_core.NEG, dt),
            "path": jnp.full((F,), -1, jnp.int32),
            "seq": jnp.zeros((F,), jnp.int32),
            "valid": jnp.zeros((F,), bool),
            "extra": jnp.zeros((F, len(extra)), dt),
        }
        best = dict(best)
        best["score"] = best["score"] + jnp.max(src_score) * 0
        return best, jnp.asarray(False), recs

    TpuDecoder._expand_finals = fake_finals
    no_finals = run("no final expansion")
    TpuDecoder._expand_finals = orig_finals

    print(f"\nattribution (of {base*1e3:.1f} ms):")
    print(f"  merge+insert sorts : {(base-no_merge)*1e3:8.1f} ms")
    print(f"  entry expansion    : {(base-no_expand)*1e3:8.1f} ms")
    print(f"  final expansion    : {(base-no_finals)*1e3:8.1f} ms")
    print(f"  rest (internal+gmm): {(no_merge+no_expand+no_finals-2*base)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
