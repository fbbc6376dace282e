"""Frontier/expansion budget autotuning.

The TPU decoder's per-frame cost scales with its static capacities — the
frontier slot count K (`max_insts`) and the expansion budget E
(`expand_budget`). The reference sizes its pools dynamically per frame
(`WFSTModelPool`, DecHypHistPool grow on demand); a compiled TPU scan
cannot, so capacities must be chosen up front. This tuner picks them
from measured peak occupancy on sample utterances, with a safety margin,
and certifies exactness: the decoder raises its `overflow` flag whenever
ANY budget binds (entry expansion, final expansion, or frontier slots),
so a no-overflow decode is bit-identical to one with unbounded budgets.

Typical use: tune once per (network, beam settings) deployment on a few
representative utterances, then build production decoders with the
returned config. This is SURVEY.md §7 step 8's "frontier-size
autotuning".
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from .tpu_core import TpuDecoder, TpuDecoderConfig


def _round_up(x: int, m: int) -> int:
    return max(m, ((int(x) + m - 1) // m) * m)


def autotune_budgets(
    artifact,
    score_samples: Sequence[np.ndarray],
    cfg: Optional[TpuDecoderConfig] = None,
    margin: float = 1.5,
    max_rounds: int = 6,
    verify: bool = True,
    g_network=None,
    verbose: bool = False,
) -> TpuDecoderConfig:
    """Pick minimal safe (max_insts, expand_budget) for this workload.

    score_samples: (T, n_gmms) GMM log-likelihood matrices of
    representative utterances (use the same acoustic scorer as
    production). Starts from ``cfg`` (or its defaults), grows budgets
    geometrically until no sample overflows, then shrinks to measured
    peak * margin (lane-aligned). With verify=True the tuned config is
    re-run to confirm no overflow and identical 1-best words/scores.
    """
    base = cfg or TpuDecoderConfig()
    probe = dataclasses.replace(base, emit_diagnostics=True)

    ref_results = None
    for _round in range(max_rounds):
        dec = TpuDecoder(artifact, probe, g_network=g_network)
        results = [dec.decode_scores(s) for s in score_samples]
        if verbose:
            print(f"[autotune] probe K={probe.max_insts} "
                  f"E={probe.expand_budget}: overflow "
                  f"{sum(r.overflow for r in results)}/{len(results)}, "
                  f"peak {max(r.max_active for r in results)}/"
                  f"{max(r.max_cand for r in results)}", flush=True)
        if not any(r.overflow for r in results):
            ref_results = results
            break
        probe = dataclasses.replace(
            probe,
            max_insts=probe.max_insts * 2,
            expand_budget=probe.expand_budget * 2,
            final_budget=probe.final_budget * 2,
        )
    if ref_results is None:
        raise RuntimeError(
            f"autotune: still overflowing at max_insts={probe.max_insts}, "
            f"expand_budget={probe.expand_budget} after {max_rounds} doublings"
        )

    max_active = max(r.max_active for r in ref_results)
    max_cand = max(r.max_cand for r in ref_results)
    # lane-aligned multiples of 128 for both: per-frame cost is dominated by
    # the (K+E)-row co-sort and scales ~linearly in K+E (measured on v5e:
    # E 512->128 at K=128 is ~2x decode throughput), so budgets should sit
    # as low as the margin allows
    tuned = dataclasses.replace(
        base,
        max_insts=min(_round_up(max_active * margin, 128), probe.max_insts),
        expand_budget=min(_round_up(max_cand * margin, 128), probe.expand_budget),
        final_budget=probe.final_budget,
    )
    if tuned.max_insts >= probe.max_insts and tuned.expand_budget >= probe.expand_budget:
        return dataclasses.replace(
            base, max_insts=probe.max_insts, expand_budget=probe.expand_budget,
            final_budget=probe.final_budget,
        )

    if verify:
        vdec = TpuDecoder(artifact, dataclasses.replace(tuned, emit_diagnostics=True),
                          g_network=g_network)
        for s, ref in zip(score_samples, ref_results):
            got = vdec.decode_scores(s)
            if got.overflow:
                # margin too thin for this sample: fall back to the probe size
                return dataclasses.replace(
                    base,
                    max_insts=probe.max_insts,
                    expand_budget=probe.expand_budget,
                    final_budget=probe.final_budget,
                )
            assert got.words == ref.words and abs(got.score - ref.score) < 1e-6, (
                "autotune verification mismatch — please report (overflow "
                "tracking should make this impossible)"
            )
    return tuned
