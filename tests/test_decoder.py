"""Decoder tests: oracle (RefDecoder) sanity + TPU-core parity."""

import math

import numpy as np
import pytest

import jax

from juicer_tpu.fst import EPSILON, Fst, LOG
from juicer_tpu.am.mmf import MmfDef, MmfHmm, MmfMixture, MmfState, MmfTransMat
from juicer_tpu.am import AcousticModelSet
from juicer_tpu.decoder import DecoderNetwork, RefDecoder, TpuDecoder
from juicer_tpu.decoder.tpu_core import TpuDecoderConfig
from juicer_tpu.decoder.artifact import DecoderArtifact

LOG_ZERO = -1e30


def make_models(n_hmms, n_emit=3, dim=4, n_comps=2, seed=0, tee_probs=None):
    rng = np.random.default_rng(seed)
    d = MmfDef()
    d.global_opts.vec_size = dim
    n = n_emit + 2
    for h in range(n_hmms):
        probs = np.zeros((n, n))
        probs[0, 1] = 1.0
        tee = tee_probs[h] if tee_probs else 0.0
        if tee > 0:
            probs[0, 1] = 1.0 - tee
            probs[0, n - 1] = tee
        for i in range(1, n - 1):
            probs[i, i] = 0.5
            probs[i, i + 1] = 0.5
        states = [
            MmfState(
                mixtures=[
                    MmfMixture(
                        1.0 / n_comps,
                        rng.normal(size=dim),
                        np.abs(rng.normal(size=dim)) + 0.5,
                    )
                    for _ in range(n_comps)
                ]
            )
            for _ in range(n_emit)
        ]
        d.hmms.append(MmfHmm(f"hmm{h}", n, states, MmfTransMat(None, n, probs)))
    return AcousticModelSet.from_def(d)


def make_linear_net(n_words=3, hmms_per_word=2, weights=None):
    """words in sequence: chain of HMM arcs, word label on last arc of each
    word, returning (fst, n_hmms)."""
    f = Fst(LOG)
    s = f.add_state()
    f.set_start(s)
    hmm = 0
    for w in range(n_words):
        for p in range(hmms_per_word):
            t = f.add_state()
            ol = (w + 1) if p == hmms_per_word - 1 else EPSILON
            cost = 0.1 * (w + p) if weights is None else weights
            f.add_arc(s, t, hmm + 1, ol, cost)
            s = t
            hmm += 1
    f.set_final(s, 0.05)
    return f, hmm


def scores_matrix(models, T, seed=1):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(T, models.vec_size))
    return np.stack([models.score_all(feats[t]) for t in range(T)])


def run_both(fst, models, T, seed=1, cfg=None, lm_scale=1.0, ins_pen=0.0):
    net = DecoderNetwork(fst, lm_scale=lm_scale, ins_pen=ins_pen)
    sc = scores_matrix(models, T, seed)
    ref = RefDecoder(net, models, **(cfg or {}))
    r_ref = ref.decode(score_fn=lambda t, g: float(sc[t, g]), n_frames=T)
    art = DecoderArtifact(net, models)
    tcfg = TpuDecoderConfig(max_insts=64, expand_budget=256, final_budget=64,
                            dtype="float64", **(cfg or {}))
    tpu = TpuDecoder(art, tcfg)
    r_tpu = tpu.decode_scores(sc)
    return r_ref, r_tpu


@pytest.fixture(scope="module", autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


class TestRefDecoder:
    def test_single_hmm_matches_manual_viterbi(self):
        models = make_models(1, n_emit=1)  # single emitting state
        f = Fst(LOG)
        s0, s1 = (f.add_state() for _ in range(2))
        f.set_start(s0)
        f.add_arc(s0, s1, 1, 1, 0.0)
        f.set_final(s1, 0.0)
        net = DecoderNetwork(f)
        T = 4
        sc = scores_matrix(models, T)
        ref = RefDecoder(net, models)
        res = ref.decode(score_fn=lambda t, g: float(sc[t, g]), n_frames=T)
        assert res.words == [1]
        # manual: single state self-loop: sum of scores + transitions
        trP = models.get_trans_mat(0)
        expect = trP[0, 1] + sc[0, 0] + (T - 1) * trP[1, 1] + sc[1:, 0].sum() + trP[1, 2]
        # decoder normalizes per-frame but tracks acoustic separately
        assert abs(res.acoustic_score - expect) < 1e-9

    def test_two_word_choice(self):
        # two parallel arcs with different words; the better-scoring HMM wins
        models = make_models(2, n_emit=2)
        f = Fst(LOG)
        s0, s1 = f.add_state(), f.add_state()
        f.set_start(s0)
        f.add_arc(s0, s1, 1, 1, 0.0)
        f.add_arc(s0, s1, 2, 2, 0.0)
        f.set_final(s1, 0.0)
        net = DecoderNetwork(f)
        T = 5
        sc = scores_matrix(models, T)
        ref = RefDecoder(net, models)
        res = ref.decode(score_fn=lambda t, g: float(sc[t, g]), n_frames=T)
        assert res.words in ([1], [2])
        # compare against brute-force single-arc decode of each word
        singles = []
        for w in (1, 2):
            g = Fst(LOG)
            a0, a1 = g.add_state(), g.add_state()
            g.set_start(a0)
            g.add_arc(a0, a1, w, w, 0.0)
            g.set_final(a1, 0.0)
            r = RefDecoder(DecoderNetwork(g), models).decode(
                score_fn=lambda t, gg: float(sc[t, gg]), n_frames=T
            )
            # the normalized score depends on the network (per-frame best),
            # so compare the un-normalized acoustic+LM total
            singles.append(r.acoustic_score + r.lm_score)
        best = int(np.argmax(singles)) + 1
        assert res.words == [best]
        assert abs((res.acoustic_score + res.lm_score) - max(singles)) < 1e-9


class TestTpuParity:
    def test_linear_chain(self):
        models = make_models(6)
        fst, n = make_linear_net(3, 2)
        r_ref, r_tpu = run_both(fst, models, T=20)
        assert r_ref.words == r_tpu.words == [1, 2, 3]
        assert abs(r_ref.score - r_tpu.score) < 1e-6
        assert abs(r_ref.acoustic_score - r_tpu.acoustic_score) < 1e-6
        assert abs(r_ref.lm_score - r_tpu.lm_score) < 1e-6
        # word boundary frames must match
        assert [h.end_frame for h in r_ref.word_hyps] == [
            h.end_frame for h in r_tpu.word_hyps
        ]

    def test_branching_network(self):
        # diamond: two word options then a shared suffix word
        models = make_models(6, seed=3)
        f = Fst(LOG)
        s0, s1, s2 = (f.add_state() for _ in range(3))
        f.set_start(s0)
        f.add_arc(s0, s1, 1, 1, 0.2)
        f.add_arc(s0, s1, 2, 2, 0.1)
        f.add_arc(s1, s2, 3, 3, 0.0)
        f.set_final(s2, 0.0)
        r_ref, r_tpu = run_both(f, models, T=12, seed=7)
        assert r_ref.words == r_tpu.words
        assert abs(r_ref.score - r_tpu.score) < 1e-6

    def test_eps_arcs_with_word_outputs(self):
        # eps arc carrying a word label between two HMM arcs
        models = make_models(2, seed=5)
        f = Fst(LOG)
        s0, s1, s2, s3 = (f.add_state() for _ in range(4))
        f.set_start(s0)
        f.add_arc(s0, s1, 1, EPSILON, 0.0)
        f.add_arc(s1, s2, EPSILON, 7, 0.3)  # word emitted on eps arc
        f.add_arc(s2, s3, 2, 8, 0.0)
        f.set_final(s3, 0.1)
        r_ref, r_tpu = run_both(f, models, T=10, seed=2)
        assert r_ref.words == [7, 8]
        assert r_tpu.words == [7, 8]
        assert abs(r_ref.score - r_tpu.score) < 1e-6
        assert abs(r_ref.lm_score - r_tpu.lm_score) < 1e-6

    def test_tee_model_chain(self):
        # middle HMM is a tee model: direct entry->exit path exists
        models = make_models(3, seed=11, tee_probs=[0.0, 0.3, 0.0])
        f = Fst(LOG)
        s0, s1, s2, s3 = (f.add_state() for _ in range(4))
        f.set_start(s0)
        f.add_arc(s0, s1, 1, 1, 0.0)
        f.add_arc(s1, s2, 2, 2, 0.0)
        f.add_arc(s2, s3, 3, 3, 0.0)
        f.set_final(s3, 0.0)
        r_ref, r_tpu = run_both(f, models, T=8, seed=4)
        assert r_ref.words == r_tpu.words
        assert abs(r_ref.score - r_tpu.score) < 1e-6
        assert abs(r_ref.acoustic_score - r_tpu.acoustic_score) < 1e-6

    def test_loop_network_long(self):
        # word loop: both cores must agree over a long utterance
        models = make_models(4, seed=13)
        f = Fst(LOG)
        s0 = f.add_state()
        f.set_start(s0)
        for w in range(4):
            f.add_arc(s0, s0, w + 1, w + 1, 0.5)
        f.set_final(s0, 0.0)
        r_ref, r_tpu = run_both(f, models, T=40, seed=9)
        assert r_ref.words == r_tpu.words
        assert len(r_ref.words) > 1
        assert abs(r_ref.score - r_tpu.score) < 1e-5

    def test_with_beam_pruning(self):
        models = make_models(4, seed=17)
        f = Fst(LOG)
        s0 = f.add_state()
        f.set_start(s0)
        for w in range(4):
            f.add_arc(s0, s0, w + 1, w + 1, 0.5)
        f.set_final(s0, 0.0)
        cfg = dict(emit_prune_win=80.0, phone_end_prune_win=60.0, word_prune_win=60.0)
        r_ref, r_tpu = run_both(f, models, T=30, seed=19, cfg=cfg)
        assert r_ref.words == r_tpu.words
        assert abs(r_ref.score - r_tpu.score) < 1e-5

    def test_max_emit_hyps_above_capacity(self):
        # a k larger than the frontier's K*S token capacity can never bind;
        # the TPU core must clamp top_k's k instead of crashing
        models = make_models(4, seed=17)
        f = Fst(LOG)
        s0 = f.add_state()
        f.set_start(s0)
        for w in range(4):
            f.add_arc(s0, s0, w + 1, w + 1, 0.5)
        f.set_final(s0, 0.0)
        r_plain, r_tpu_plain = run_both(f, models, T=20, seed=19)
        r_ref, r_tpu = run_both(f, models, T=20, seed=19,
                                cfg=dict(max_emit_hyps=100000))
        assert r_tpu.words == r_tpu_plain.words == r_ref.words
        assert abs(r_tpu.score - r_tpu_plain.score) < 1e-9

    def test_lm_scale_and_ins_pen(self):
        models = make_models(6, seed=23)
        fst, _ = make_linear_net(3, 2)
        net_kwargs = dict(lm_scale=2.5, ins_pen=-1.5)
        models2 = models
        net = DecoderNetwork(fst, **net_kwargs)
        sc = scores_matrix(models2, 15, seed=21)
        ref = RefDecoder(net, models2)
        r_ref = ref.decode(score_fn=lambda t, g: float(sc[t, g]), n_frames=15)
        art = DecoderArtifact(net, models2)
        tpu = TpuDecoder(art, TpuDecoderConfig(max_insts=64, expand_budget=256,
                                               final_budget=64, dtype="float64"))
        r_tpu = tpu.decode_scores(sc)
        assert r_ref.words == r_tpu.words
        assert abs(r_ref.score - r_tpu.score) < 1e-6
        assert abs(r_ref.lm_score - r_tpu.lm_score) < 1e-6

    def test_empty_result_when_no_final_reachable(self):
        models = make_models(2)
        f = Fst(LOG)
        s0, s1, s2 = (f.add_state() for _ in range(3))
        f.set_start(s0)
        f.add_arc(s0, s1, 1, 1, 0.0)
        f.add_arc(s1, s2, 2, 2, 0.0)
        f.set_final(s2, 0.0)
        # T=1 too short to cross two 3-emitting-state HMMs
        r_ref, r_tpu = run_both(f, models, T=1)
        assert r_ref.empty and r_tpu.empty


class TestTpuParityCLG:
    def test_toy_clg_decode(self):
        """Full pipeline: compile toy CLG, random GMM models per monophone,
        decode synthetic features with both cores."""
        from juicer_tpu.lexicon import Lexicon
        from juicer_tpu.compile import (
            CDGen, CDPhoneLookup, CDType, GramGen, GramType, LexGen, build_clg,
        )
        import tempfile, os

        with tempfile.TemporaryDirectory() as td:
            with open(os.path.join(td, "lex.dict"), "w") as fd:
                fd.write("a(1.0) ah\ncat k ae t\n<s> sil\n</s> sil\n")
            with open(os.path.join(td, "phones.lst"), "w") as fd:
                fd.write("ah\nk\nae\nt\nsil\n")
            with open(os.path.join(td, "lm.arpa"), "w") as fd:
                fd.write(
                    "\\data\\\nngram 1=4\nngram 2=3\n\n\\1-grams:\n"
                    "-0.60206 </s>\n-99 <s> -0.30103\n-0.47712 a -0.30103\n"
                    "-0.60206 cat -0.30103\n\n\\2-grams:\n-0.30103 <s> a\n"
                    "-0.47712 a cat\n-0.30103 cat </s>\n\n\\end\\\n"
                )
            lex = Lexicon.load(
                os.path.join(td, "phones.lst"), os.path.join(td, "lex.dict"),
                sil_phone="sil", sent_start_word="<s>", sent_end_word="</s>",
                spec_word_char="",
            )
            G = GramGen(lex.vocab, GramType.NGRAM, lm_fname=os.path.join(td, "lm.arpa")).build()
            lg = LexGen(lex)
            L = lg.build()
            ps = lex.phone_set
            lookup = CDPhoneLookup(ps)
            lookup.add_phones(list(ps.phones))
            lookup.bind_models(list(ps.phones))
            C = CDGen(CDType.MONOPHONE, lookup, list(ps.phones), n_aux_syms=lg.n_aux).build()
            clg = build_clg(G, L, C).clg

        models = make_models(len(ps.phones), n_emit=3, seed=31)
        net = DecoderNetwork(clg, clg.isyms, clg.osyms)
        T = 30
        sc = scores_matrix(models, T, seed=33)
        ref = RefDecoder(net, models)
        r_ref = ref.decode(score_fn=lambda t, g: float(sc[t, g]), n_frames=T)
        art = DecoderArtifact(net, models)
        tpu = TpuDecoder(art, TpuDecoderConfig(max_insts=128, expand_budget=512,
                                               final_budget=128, dtype="float64"))
        r_tpu = tpu.decode_scores(sc)
        assert not r_ref.empty
        assert r_ref.words == r_tpu.words
        assert abs(r_ref.score - r_tpu.score) < 1e-6
        assert [h.end_frame for h in r_ref.word_hyps] == [
            h.end_frame for h in r_tpu.word_hyps
        ]
