"""Conformance fuzz against the REAL reference decoder binary.

Builds the reference's unmodified `WFSTDecoderLite` (WFSTDecoderLite.cpp)
with a scripted-score IModels shim (native/refcheck/shim/ScriptedModels.*)
and fuzzes it against both the python transcription oracle
(`decoder/ref_core.py`) and the TPU engine over random (network, scores,
pruning-config) cases. This converts every decoder parity claim from
"matches the hand transcription" to "matches the reference binary"
(round-3 VERDICT item #3).

Precision discipline: the binary runs the reference's real build types
(real=float, USE_DOUBLE_SCORE token/path scores in double —
src/Makefile.am:24). All inputs (network weights, transP, GMM scores)
are pre-rounded to f32-representable values and shipped in exact form
(dyadic weights in FSM text, f64 binary files), so double-accumulated
token scores compare near-exactly; float-accumulated fields
(lmScore, per-word acousticScore) compare at f32 tolerance.
"""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

import jax

from juicer_tpu.decoder import DecoderNetwork, RefDecoder, TpuDecoder
from juicer_tpu.decoder.artifact import DecoderArtifact
from juicer_tpu.decoder.tpu_core import TpuDecoderConfig

from test_decoder import make_models, scores_matrix
from test_fuzz_parity import random_network

REF_SRC = os.environ.get("JTPU_REF_SRC", "/root/reference/src")
BUILD_SH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native", "refcheck", "build.sh",
)

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF_SRC) and shutil.which("g++")),
    reason="reference sources or g++ unavailable",
)


@pytest.fixture(scope="module", autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def refbin(tmp_path_factory):
    out = tmp_path_factory.mktemp("refbin")
    r = subprocess.run(["sh", BUILD_SH, str(out)], capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"reference tool build failed: {r.stderr[-500:]}")
    return out / "decoder_oracle"


# -- exporters ---------------------------------------------------------------


def _round_f32(x):
    return np.float64(np.float32(x))


def _dyadic(w, denom=256.0):
    """Round to a multiple of 1/denom: exactly representable in f32 text."""
    return np.round(np.asarray(w, dtype=np.float64) * denom) / denom


def write_fsm_f32(fst, path):
    """FSM writer with exact decimal weights (repr of dyadic values), the
    first-line-is-initial-state rule, AND arcs grouped by source state:
    WFSTDecoderLite iterates a state's out-transitions as a contiguous
    block of the transitions array (`WFSTNetwork::getTransitions(prev,
    WFSTTransition**)`, WFSTNetwork.cpp:709-721 — it returns a pointer to
    the state's first transition and a count), so real juicer inputs must
    be state-grouped. All reference toolchain outputs are; random fuzz
    networks must be grouped explicitly."""
    order = sorted(
        range(fst.num_arcs),
        key=lambda i: (fst.arc_src[i] != fst.start, fst.arc_src[i]),
    )
    with open(path, "w") as fd:
        for i in order:
            fd.write(
                f"{fst.arc_src[i]} {fst.arc_dst[i]} {fst.arc_ilabel[i]} "
                f"{fst.arc_olabel[i]} {fst.arc_weight[i]!r}\n"
            )
        for s in sorted(fst.finals):
            fd.write(f"{s} {fst.finals[s]!r}\n")


def write_syms(path, prefix, n):
    with open(path, "w") as fd:
        fd.write("<eps> 0\n")
        for i in range(1, n + 1):
            fd.write(f"{prefix}{i} {i}\n")


def write_models_bin(models, path):
    """ScriptedModels format (native/refcheck/shim/ScriptedModels.h)."""
    n_hmms = models.n_hmms
    n_gmms = models.n_gmms
    with open(path, "wb") as fd:
        fd.write(struct.pack("<iii", 0x4A54504D, n_hmms, n_gmms))
        for h in range(n_hmms):
            tm = np.asarray(models.get_trans_mat(h), dtype=np.float64)
            n = tm.shape[0]
            fd.write(struct.pack("<i", n))
            fd.write(tm.astype("<f8").tobytes())
            fd.write(np.asarray(models.hmm_gmm_inds[h], dtype="<i4").tobytes())


def write_scores_bin(sc, path):
    sc = np.asarray(sc, dtype=np.float64)
    with open(path, "wb") as fd:
        fd.write(struct.pack("<iii", 0x4A545053, sc.shape[0], sc.shape[1]))
        fd.write(sc.astype("<f8").tobytes())


def run_oracle(binary, tmp, fst, models, sc, lm_scale, ins_pen, beams, max_hyps):
    fsm = tmp / "net.fsm"
    insyms = tmp / "net.insyms"
    outsyms = tmp / "net.outsyms"
    mbin = tmp / "models.bin"
    sbin = tmp / "scores.bin"
    write_fsm_f32(fst, fsm)
    write_syms(insyms, "m", max(models.n_hmms, int(np.max(fst.arc_ilabel, initial=0))))
    write_syms(outsyms, "w", int(np.max(fst.arc_olabel, initial=0)) or 1)
    write_models_bin(models, mbin)
    write_scores_bin(sc, sbin)
    start, main, end, word = beams
    r = subprocess.run(
        [str(binary), str(fsm), str(insyms), str(outsyms), str(mbin), str(sbin),
         repr(lm_scale), repr(ins_pen), repr(start), repr(main), repr(end),
         repr(word), str(max_hyps)],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-800:]
    lines = r.stdout.strip().splitlines()
    if lines[0] == "EMPTY":
        # The reference conflates "no token survived" and "best path has
        # zero word outputs": in the latter case recognitionFinish leaves
        # bestDecHyp at its inactive defaults because best.path == NULL
        # (WFSTDecoderLite.cpp:262-300), and DecoderSingleTest reports it
        # exactly like a dead utterance. Only the true-empty case prints
        # the "no token survived" warning, which disambiguates.
        return None if "no token survived" in r.stderr else {"no_words": True}
    _, score, ac, lm = lines[0].split()
    words = []
    for line in lines[1:]:
        _, lab, t, ws, wa, wl = line.split()
        words.append((int(lab), int(t), float(ws), float(wa), float(wl)))
    return {
        "score": float(score), "acoustic": float(ac), "lm": float(lm),
        "words": words,
    }


# -- comparison --------------------------------------------------------------


def assert_vs_oracle(ob, res, ctx):
    """ob: parsed binary output (or None); res: DecodeResult."""
    if ob is None:
        assert res.empty, (ctx, "binary EMPTY but python decoded", res.words)
        return
    assert not res.empty, (ctx, "python EMPTY but binary decoded", ob)
    if ob.get("no_words"):
        # survived with zero word outputs: the binary reports nothing
        # further (see run_oracle) — only the word list can be compared
        assert res.words == [], (ctx, "binary no-words but python decoded",
                                 res.words)
        return
    labs = [w[0] for w in ob["words"]]
    times = [w[1] for w in ob["words"]]
    assert labs == res.words, (ctx, labs, res.words)
    assert times == [h.end_frame for h in res.word_hyps], (
        ctx, times, [h.end_frame for h in res.word_hyps])
    # Token scores accumulate in double (USE_DOUBLE_SCORE) but every
    # reported field passes through f32 DecHypHist/DecHyp members
    # (`real score` etc., DecHypHistPool.h:38-48), so comparisons are
    # f32-ulp-relative. lmScore ACCUMULATES in float, so it compounds.
    def close(a, b, rel=4e-6, ab=2e-4):
        return abs(a - b) < ab + rel * abs(b)

    assert close(ob["score"], res.score), (ctx, ob["score"], res.score)
    assert close(ob["acoustic"], res.acoustic_score), (
        ctx, ob["acoustic"], res.acoustic_score)
    assert close(ob["lm"], res.lm_score, ab=2e-3), (
        ctx, ob["lm"], res.lm_score)
    for bw, h in zip(ob["words"], res.word_hyps):
        assert close(bw[2], h.score), (ctx, bw, h)
        assert close(bw[3], h.acoustic, ab=2e-3), (ctx, bw, h)
        assert close(bw[4], h.lm, ab=2e-3), (ctx, bw, h)


def f32_condition(models, fst):
    """Round every input the binary consumes through f32 so both sides
    see bit-identical values."""
    models.trans_mats = [_round_f32(tm) for tm in models.trans_mats]
    fst.arc_weight = [float(w) for w in _dyadic(fst.arc_weight)]
    fst.finals = {s: float(_dyadic(w)) for s, w in fst.finals.items()}


def make_case(seed, max_states=9):
    rng = np.random.default_rng(7000 + seed)
    n_models = int(rng.integers(2, 6))
    tee = [0.3 if rng.random() < 0.3 else 0.0 for _ in range(n_models)]
    tee_models = {m for m, t in enumerate(tee) if t > 0}
    models = make_models(n_models, n_emit=int(rng.integers(1, 4)),
                         dim=4, n_comps=2, seed=seed, tee_probs=tee)
    fst = random_network(rng, n_models, tee_models, max_states=max_states)
    f32_condition(models, fst)
    return rng, models, fst


CONFIGS = [
    # (lm_scale, ins_pen, (start, main, end, word) beams, max_hyps)
    (1.0, 0.0, (0.0, 0.0, 0.0, 0.0), 0),          # exact search
    (1.0, 0.0, (0.0, 8.0, 0.0, 0.0), 0),          # main beam only
    (1.0, 0.0, (7.0, 8.0, 6.0, 6.5), 0),          # all four windows
    (1.0, 0.0, (0.0, 10.0, 0.0, 0.0), 6),         # binding histogram
    (1.5, 0.5, (0.0, 9.0, 7.0, 0.0), 0),          # lmScale + insPen
    (1.0, 0.0, (0.0, 4.0, 3.0, 3.0), 4),          # tight everything
]


def run_case(refbin, tmp_path, seed, cfg_idx, n_draws=2, t_lo=8, t_hi=24):
    lm_scale, ins_pen, beams, max_hyps = CONFIGS[cfg_idx % len(CONFIGS)]
    rng, models, fst = make_case(seed)
    tmp = tmp_path / f"case{seed}_{cfg_idx}"
    tmp.mkdir()

    # both python decoders read the network back from the SAME fsm text
    # the binary loads, so arc order (= tie-breaking order) is identical
    write_fsm_f32(fst, tmp / "net.fsm")
    net = DecoderNetwork.from_files(
        str(tmp / "net.fsm"), lm_scale=lm_scale, ins_pen=ins_pen)

    pycfg = dict(
        phone_start_prune_win=beams[0], emit_prune_win=beams[1],
        phone_end_prune_win=beams[2], word_prune_win=beams[3],
        max_emit_hyps=max_hyps,
    )
    art = DecoderArtifact(net, models)
    tcfg = TpuDecoderConfig(max_insts=96, expand_budget=384, final_budget=96,
                            dtype="float64", **pycfg)
    tpu = TpuDecoder(art, tcfg)

    for d in range(n_draws):
        T = int(rng.integers(t_lo, t_hi))
        sc = _round_f32(scores_matrix(models, T, seed=9000 + 31 * seed + d))
        ctx = (seed, cfg_idx, d, T)
        ob = run_oracle(refbin, tmp, fst, models, sc,
                        lm_scale, ins_pen, beams, max_hyps)
        r_ref = RefDecoder(net, models, **pycfg).decode(
            score_fn=lambda t, g: float(sc[t, g]), n_frames=T)
        assert_vs_oracle(ob, r_ref, ctx + ("ref_core",))
        r_tpu = tpu.decode_scores(sc)
        assert_vs_oracle(ob, r_tpu, ctx + ("tpu",))


@pytest.mark.parametrize("seed", range(12))
def test_ref_decoder_fuzz(refbin, tmp_path, seed):
    """12 networks x 6 configs x 2 score draws = 144 (net, scores, config)
    oracle-vs-binary cases, plus the same against the TPU engine."""
    for cfg_idx in range(len(CONFIGS)):
        run_case(refbin, tmp_path, seed, cfg_idx)


def test_ref_decoder_empty(refbin, tmp_path):
    """All-pruned case: both sides must report no surviving hypothesis."""
    rng, models, fst = make_case(99)
    sc = _round_f32(scores_matrix(models, 10, seed=5))
    # absurdly tight beam kills everything
    ob = run_oracle(refbin, tmp_path, fst, models, sc,
                    1.0, 0.0, (0.0, 0.01, 0.0, 0.0), 0)
    net = DecoderNetwork(fst)
    r = RefDecoder(net, models, emit_prune_win=0.01).decode(
        score_fn=lambda t, g: float(sc[t, g]), n_frames=10)
    assert_vs_oracle(ob, r, ("empty",))
