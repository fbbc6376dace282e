"""Randomized conformance fuzzing: TPU engine vs the float64 oracle.

Random small networks (random topology, eps arcs with/without word labels,
tee models, random weights) x random score matrices. Any disagreement in
1-best words or scores is a real engine bug — this is the bring-up analogue
of the reference-binary conformance oracle (SURVEY.md §4).
"""

import numpy as np
import pytest

import jax

from juicer_tpu.fst import EPSILON, Fst, LOG
from juicer_tpu.decoder import DecoderNetwork, RefDecoder, TpuDecoder
from juicer_tpu.decoder.artifact import DecoderArtifact
from juicer_tpu.decoder.tpu_core import TpuDecoderConfig

from test_decoder import make_models, scores_matrix


@pytest.fixture(scope="module", autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def random_network(rng, n_models, tee_models):
    """Random network with eps/word/tee variety.

    Eps arcs and tee-model arcs only go forward (dst > src): in-frame
    propagation recurses through them, so cycles would diverge without
    pruning — exactly as in the reference's recursive `propagateToken`.
    """
    f = Fst(LOG)
    n_states = int(rng.integers(3, 9))
    for _ in range(n_states):
        f.add_state()
    f.set_start(0)
    n_arcs = int(rng.integers(n_states, 3 * n_states))
    for _ in range(n_arcs):
        src = int(rng.integers(0, n_states))
        dst = int(rng.integers(0, n_states))
        if rng.random() < 0.25:
            il = EPSILON
        else:
            il = int(rng.integers(1, n_models + 1))
        if (il == EPSILON or (il - 1) in tee_models) and dst <= src:
            if src == n_states - 1:
                continue
            dst = int(rng.integers(src + 1, n_states))
        ol = int(rng.integers(1, 6)) if rng.random() < 0.4 else EPSILON
        w = float(np.round(rng.normal(0, 0.8), 3))
        f.add_arc(src, dst, il, ol, w)
    # chain to guarantee some path start->...->final (non-tee models only)
    non_tee = [m for m in range(n_models) if m not in tee_models] or [0]
    for s in range(n_states - 1):
        f.add_arc(s, s + 1, int(rng.choice(non_tee)) + 1, EPSILON, 0.1)
    f.set_final(n_states - 1, float(np.round(abs(rng.normal()), 3)))
    if rng.random() < 0.3:
        f.set_final(int(rng.integers(0, n_states)), 0.2)
    return f


@pytest.mark.parametrize("trial", range(12))
def test_fuzz_parity(trial):
    rng = np.random.default_rng(1000 + trial)
    n_models = int(rng.integers(2, 6))
    tee = [0.3 if rng.random() < 0.3 else 0.0 for _ in range(n_models)]
    tee_models = {m for m, t in enumerate(tee) if t > 0}
    models = make_models(n_models, n_emit=int(rng.integers(1, 4)),
                         dim=4, n_comps=2, seed=trial, tee_probs=tee)
    fst = random_network(rng, n_models, tee_models)
    net = DecoderNetwork(fst)
    T = int(rng.integers(4, 25))
    sc = scores_matrix(models, T, seed=trial + 500)

    cfgs = [dict()]
    if trial % 3 == 0:
        cfgs.append(dict(emit_prune_win=50.0, phone_end_prune_win=40.0,
                         word_prune_win=40.0))
    for cfg in cfgs:
        ref = RefDecoder(net, models, **cfg)
        r_ref = ref.decode(score_fn=lambda t, g: float(sc[t, g]), n_frames=T)
        art = DecoderArtifact(net, models)
        dec = TpuDecoder(
            art,
            TpuDecoderConfig(max_insts=128, expand_budget=1024, final_budget=256,
                             dtype="float64", **cfg),
        )
        r_tpu = dec.decode_scores(sc)
        assert r_ref.empty == r_tpu.empty, (trial, cfg)
        if not r_ref.empty:
            assert r_ref.words == r_tpu.words, (trial, cfg, r_ref.words, r_tpu.words)
            assert abs(r_ref.score - r_tpu.score) < 1e-6, (trial, cfg)
            assert abs(r_ref.acoustic_score - r_tpu.acoustic_score) < 1e-6
            assert [h.end_frame for h in r_ref.word_hyps] == [
                h.end_frame for h in r_tpu.word_hyps
            ], (trial, cfg)
