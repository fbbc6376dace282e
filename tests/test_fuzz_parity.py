"""Randomized conformance fuzzing: TPU engine vs the float64 oracle.

Random networks (random topology, eps arcs with/without word labels, tee
models, random weights) x random score matrices. Any disagreement in
1-best words or scores is a real engine bug — this is the bring-up
analogue of the reference-binary conformance oracle (SURVEY.md §4).

Coverage matrix (>=100 (network, scores, config) trials):
  - exact search and beam-pruned search;
  - BINDING integer-binned histogram pruning (`Histogram::calcThresh`
    semantics, small -maxHyps) with and without a main beam;
  - both recombination strategies (dense segment-max and the WSJ-order
    (K+E)-row co-sort);
  - networks from 3 to 64 states;
  - lattice mode (best lattice path == 1-best decode);
  - streaming chunked decode == whole-utterance decode;
  - on-the-fly G composition vs the OTF oracle, with and without
    label-and-weight pushing.

Compiles are amortized: one TpuDecoder per (network, config) decodes
several score draws (shapes share the 128-frame bucket).
"""

import numpy as np
import pytest

import jax

from juicer_tpu.fst import EPSILON, Fst, LOG, algos
from juicer_tpu.decoder import DecoderNetwork, RefDecoder, TpuDecoder
from juicer_tpu.decoder.artifact import DecoderArtifact
from juicer_tpu.decoder.otf import GNetwork, RefOtfDecoder
from juicer_tpu.decoder.tpu_core import TpuDecoderConfig

from test_decoder import make_models, scores_matrix


@pytest.fixture(scope="module", autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def random_network(rng, n_models, tee_models, max_states=9):
    """Random network with eps/word/tee variety.

    Eps arcs and tee-model arcs only go forward (dst > src): in-frame
    propagation recurses through them, so cycles would diverge without
    pruning — exactly as in the reference's recursive `propagateToken`.
    """
    f = Fst(LOG)
    n_states = int(rng.integers(3, max_states))
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


def random_case(seed, max_states=9):
    rng = np.random.default_rng(1000 + seed)
    n_models = int(rng.integers(2, 6))
    tee = [0.3 if rng.random() < 0.3 else 0.0 for _ in range(n_models)]
    tee_models = {m for m, t in enumerate(tee) if t > 0}
    models = make_models(n_models, n_emit=int(rng.integers(1, 4)),
                         dim=4, n_comps=2, seed=seed, tee_probs=tee)
    fst = random_network(rng, n_models, tee_models, max_states=max_states)
    return rng, models, DecoderNetwork(fst)


def assert_parity(r_ref, r_tpu, ctx, check_frames=True):
    assert r_ref.empty == r_tpu.empty, ctx
    if not r_ref.empty:
        assert r_ref.words == r_tpu.words, (ctx, r_ref.words, r_tpu.words)
        assert abs(r_ref.score - r_tpu.score) < 1e-6, ctx
        assert abs(r_ref.acoustic_score - r_tpu.acoustic_score) < 1e-6, ctx
        if check_frames:
            assert [h.end_frame for h in r_ref.word_hyps] == [
                h.end_frame for h in r_tpu.word_hyps
            ], ctx


# pruning kwargs go to BOTH engines; tpu-only kwargs select the engine
# configuration under test. Binding small -maxHyps rows exercise the
# reference's binned `Histogram::calcThresh` semantics (the TPU default).
CONFIG_ROWS = [
    (dict(), dict()),
    (dict(emit_prune_win=50.0, phone_end_prune_win=40.0, word_prune_win=40.0),
     dict(scan_unroll=3)),  # odd unroll exercises the scan remainder
    (dict(emit_prune_win=50.0, phone_end_prune_win=40.0, max_emit_hyps=3),
     dict()),
    (dict(max_emit_hyps=2), dict()),
    (dict(), dict(merge_strategy="sort")),
    (dict(emit_prune_win=50.0, phone_end_prune_win=40.0, word_prune_win=40.0,
          max_emit_hyps=4),
     dict(merge_strategy="sort")),
]

N_DRAWS = 4


@pytest.mark.parametrize("net_seed", range(12))
def test_fuzz_parity(net_seed):
    max_states = 9 if net_seed < 6 else 64
    rng, models, net = random_case(net_seed, max_states=max_states)
    big = max_states > 9
    rows = [CONFIG_ROWS[net_seed % 6], CONFIG_ROWS[(net_seed + 3) % 6]]
    for prune, extra in rows:
        ref = RefDecoder(net, models, **prune)
        art = DecoderArtifact(net, models)
        dec = TpuDecoder(
            art,
            TpuDecoderConfig(
                max_insts=512 if big else 128,
                expand_budget=4096 if big else 1024,
                final_budget=512 if big else 256,
                dtype="float64", **prune, **extra,
            ),
        )
        for draw in range(N_DRAWS):
            T = int(rng.integers(4, 40))
            sc = scores_matrix(models, T, seed=net_seed * 100 + draw)
            r_ref = ref.decode(score_fn=lambda t, g: float(sc[t, g]), n_frames=T)
            r_tpu = dec.decode_scores(sc)
            # binned-histogram thresholds quantize to an integer grid, so
            # ~1e-13 summation-order noise at a bin boundary can shift the
            # threshold a whole unit and flip the alignment of near-tie
            # paths (words/scores still agree); skip the exact word-end
            # check for binding-histogram rows
            assert_parity(r_ref, r_tpu, (net_seed, prune, extra, draw),
                          check_frames=prune.get("max_emit_hyps", 0) == 0)


def test_fuzz_histogram_binds():
    """The binding-histogram rows must actually bind somewhere: at least
    one fuzz case must differ from its unpruned decode."""
    bound = 0
    for seed in range(6):
        rng, models, net = random_case(seed + 40)
        for draw in range(2):
            T = int(rng.integers(8, 30))
            sc = scores_matrix(models, T, seed=seed * 10 + draw)
            r0 = RefDecoder(net, models).decode(
                score_fn=lambda t, g: float(sc[t, g]), n_frames=T)
            r1 = RefDecoder(net, models, max_emit_hyps=2).decode(
                score_fn=lambda t, g: float(sc[t, g]), n_frames=T)
            if r0.empty != r1.empty or (
                not r0.empty and (r0.words != r1.words
                                  or abs(r0.score - r1.score) > 1e-9)):
                bound += 1
    assert bound > 0


@pytest.mark.parametrize("net_seed", range(3))
def test_fuzz_lattice(net_seed):
    """Lattice mode on random networks: the best lattice path must equal
    the 1-best decode (words and score). Wide windows only: mid-eps-path
    beam events can't be replicated by the precomputed closure
    (decoder/artifact.py)."""
    rng, models, net = random_case(net_seed + 70)
    art = DecoderArtifact(net, models)
    dec = TpuDecoder(
        art,
        TpuDecoderConfig(max_insts=128, expand_budget=1024, final_budget=256,
                         dtype="float64", gen_lattice=True),
    )
    checked = 0
    for draw in range(2):
        T = int(rng.integers(6, 30))
        sc = scores_matrix(models, T, seed=net_seed * 10 + draw + 3)
        res, lat = dec.decode_scores_lattice(sc)
        if res.empty:
            continue
        cost, il, ol = algos.shortest_path(lat)
        assert ol == res.words, (net_seed, draw)
        assert abs(cost - (-(res.acoustic_score + res.lm_score))) < 1e-6
        checked += 1
    assert checked > 0


@pytest.mark.parametrize("net_seed", range(3))
def test_fuzz_stream(net_seed):
    """Chunked streaming decode == whole-utterance decode on random
    networks, at random chunk boundaries."""
    rng, models, net = random_case(net_seed + 90)
    art = DecoderArtifact(net, models)
    dec = TpuDecoder(
        art,
        TpuDecoderConfig(max_insts=128, expand_budget=1024, final_budget=256,
                         dtype="float64"),
    )
    for draw in range(2):
        T = int(rng.integers(10, 35))
        sc = scores_matrix(models, T, seed=net_seed * 10 + draw + 7)
        batch = dec.decode_scores(sc)
        stream = dec.stream()
        pos = 0
        while pos < T:
            n = int(rng.integers(1, max(2, T - pos + 1)))
            stream.feed(sc[pos:pos + n])
            pos += n
        final = stream.finish()
        assert final.empty == batch.empty, (net_seed, draw)
        if not batch.empty:
            assert final.words == batch.words, (net_seed, draw)
            assert abs(final.score - batch.score) < 1e-6


def random_g(rng, n_words=5, lm_scale=1.0):
    """Random backoff-grammar G: sorted word arcs per state, at most one
    eps backoff arc per state (acyclic chains ending at the root, which
    covers every word — the shape `WFSTGramGen` emits)."""
    f = Fst(LOG)
    n = int(rng.integers(2, 6))
    for _ in range(n):
        f.add_state()
    f.set_start(0)
    for w in range(1, n_words + 1):
        f.add_arc(0, int(rng.integers(0, n)), w, w,
                  float(np.round(abs(rng.normal(0, 0.7)), 3)))
    for s in range(1, n):
        for w in range(1, n_words + 1):
            if rng.random() < 0.4:
                f.add_arc(s, int(rng.integers(0, n)), w, w,
                          float(np.round(abs(rng.normal(0, 0.7)), 3)))
        # backoff to a lower state (acyclic)
        f.add_arc(s, int(rng.integers(0, s)), EPSILON, EPSILON,
                  float(np.round(abs(rng.normal(0, 0.3)) + 0.05, 3)))
    f.set_final(0, 0.1)
    if rng.random() < 0.5:
        f.set_final(int(rng.integers(0, n)), 0.3)
    return GNetwork(f, lm_scale=lm_scale)


@pytest.mark.parametrize("net_seed", range(4))
def test_fuzz_otf(net_seed):
    """On-the-fly composition on random CL x random backoff G vs the OTF
    oracle; odd seeds also run label-and-weight pushing (compensated, so
    words and un-normalized score decomposition must match the oracle)."""
    rng, models, net = random_case(net_seed + 130)
    g_net = random_g(rng)
    ref = RefOtfDecoder(net, g_net, models)
    art = DecoderArtifact(net, models)
    # budgets with real headroom: a clean suite run must not emit the
    # budget-overflow warning (round-3 review item #8)
    base = dict(max_insts=1024, expand_budget=8192, final_budget=1024,
                dtype="float64")
    decs = [TpuDecoder(art, TpuDecoderConfig(**base), g_network=g_net)]
    if net_seed % 2:
        decs.append(TpuDecoder(
            art, TpuDecoderConfig(otf_pushing=True, **base), g_network=g_net))
    for draw in range(2):
        T = int(rng.integers(6, 30))
        sc = scores_matrix(models, T, seed=net_seed * 10 + draw + 11)
        r_ref = ref.decode(score_fn=lambda t, g: float(sc[t, g]), n_frames=T)
        for i, dec in enumerate(decs):
            r_tpu = dec.decode_scores(sc)
            assert r_ref.empty == r_tpu.empty, (net_seed, draw, i)
            if not r_ref.empty:
                assert r_ref.words == r_tpu.words, (net_seed, draw, i)
                assert abs(r_ref.acoustic_score - r_tpu.acoustic_score) < 1e-6
                assert abs(r_ref.lm_score - r_tpu.lm_score) < 1e-6
