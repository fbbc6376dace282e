"""On-the-fly composition decoder tests (CL searched, G intersected lazily)."""

import os

import numpy as np
import pytest

import jax

from juicer_tpu.fst import EPSILON, Fst, LOG, algos
from juicer_tpu.lexicon import Lexicon
from juicer_tpu.compile import (
    CDGen, CDPhoneLookup, CDType, GramGen, GramType, LexGen, build_clg,
)
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


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    td = tmp_path_factory.mktemp("otf")
    (td / "lex.dict").write_text("a(1.0) ah\ncat k ae t\n<s> sil\n</s> sil\n")
    (td / "phones.lst").write_text("ah\nk\nae\nt\nsil\n")
    (td / "lm.arpa").write_text(
        "\\data\\\nngram 1=4\nngram 2=3\n\n\\1-grams:\n"
        "-0.60206 </s>\n-99 <s> -0.30103\n-0.47712 a -0.30103\n"
        "-0.60206 cat -0.30103\n\n\\2-grams:\n-0.30103 <s> a\n"
        "-0.47712 a cat\n-0.30103 cat </s>\n\n\\end\\\n"
    )
    lex = Lexicon.load(
        str(td / "phones.lst"), str(td / "lex.dict"), sil_phone="sil",
        sent_start_word="<s>", sent_end_word="</s>", spec_word_char="",
    )
    ps = lex.phone_set
    G = GramGen(lex.vocab, GramType.NGRAM, lm_fname=str(td / "lm.arpa")).build()
    lg = LexGen(lex)
    L = lg.build(output_aux_phones=True)
    lookup = CDPhoneLookup(ps)
    lookup.add_phones(list(ps.phones))
    lookup.bind_models(list(ps.phones))
    C = CDGen(CDType.MONOPHONE, lookup, list(ps.phones), n_aux_syms=lg.n_aux).build()

    # CL: compose C with closed L (static G kept separate)
    cl = algos.compose(C, algos.closure(algos.arcsort(L)))
    cl.isyms, cl.osyms = C.isyms, L.osyms
    models = make_models(len(ps.phones), n_emit=3, seed=31)
    cl_net = DecoderNetwork(cl, C.isyms, L.osyms, remove_aux="input")
    g_net = GNetwork(G)

    # reference static CLG for cross-checking the 1-best words
    clg = build_clg(G, L, C).clg
    clg_net = DecoderNetwork(clg, clg.isyms, clg.osyms)
    return dict(lex=lex, models=models, cl_net=cl_net, g_net=g_net, clg_net=clg_net)


class TestGNetwork:
    def test_advance_and_backoff(self, toy):
        g = toy["g_net"]
        v = toy["lex"].vocab
        s0 = g.init_state
        # <s> then a: direct bigram
        g1, w1 = g.advance(s0, v.get_index("<s>") + 1)
        assert g1 >= 0
        g2, w2 = g.advance(g1, v.get_index("a") + 1)
        assert g2 >= 0
        # cat after <s> requires backoff (no bigram <s> cat)
        g3, w3 = g.advance(g1, v.get_index("cat") + 1)
        assert g3 >= 0
        assert w3 < w2  # backoff penalty + lower prob
        # final reach from the </s> context state
        g4, _ = g.advance(g2, v.get_index("cat") + 1)
        g5, _ = g.advance(g4, v.get_index("</s>") + 1)
        assert g.final_reach[g5] > -1e29

    def test_dead_word(self, toy):
        g = toy["g_net"]
        gx, wx = g.advance(g.init_state, 9999)
        assert gx == -1


class TestOtfParity:
    def test_oracle_vs_tpu(self, toy):
        models = toy["models"]
        T = 30
        sc = scores_matrix(models, T, seed=33)
        ref = RefOtfDecoder(toy["cl_net"], toy["g_net"], models)
        r_ref = ref.decode(score_fn=lambda t, g: float(sc[t, g]), n_frames=T)
        art = DecoderArtifact(toy["cl_net"], models)
        dec = TpuDecoder(
            art,
            TpuDecoderConfig(max_insts=256, expand_budget=1024, final_budget=256,
                             dtype="float64"),
            g_network=toy["g_net"],
        )
        r_tpu = dec.decode_scores(sc)
        assert not r_ref.empty
        assert r_ref.words == r_tpu.words
        assert abs(r_ref.score - r_tpu.score) < 1e-6
        assert abs(r_ref.lm_score - r_tpu.lm_score) < 1e-6

    def test_pushing_matches_nonpushing(self, toy):
        """Label-and-weight pushing is score-compensated: with wide beams the
        results are identical to non-pushing OTF (and the oracle)."""
        models = toy["models"]
        T = 30
        sc = scores_matrix(models, T, seed=33)
        art = DecoderArtifact(toy["cl_net"], models)
        base_cfg = dict(max_insts=256, expand_budget=1024, final_budget=256,
                        dtype="float64")
        plain = TpuDecoder(art, TpuDecoderConfig(**base_cfg), g_network=toy["g_net"])
        pushed = TpuDecoder(
            art, TpuDecoderConfig(otf_pushing=True, **base_cfg),
            g_network=toy["g_net"],
        )
        r0 = plain.decode_scores(sc)
        r1 = pushed.decode_scores(sc)
        assert r0.words == r1.words
        # the NORMALIZED score differs (per-frame normalizers see the
        # lookahead); the un-normalized decomposition must agree exactly
        assert abs(r0.acoustic_score - r1.acoustic_score) < 1e-6
        assert abs(r0.lm_score - r1.lm_score) < 1e-6

    def test_pushing_prunes_with_lm_early(self, toy):
        """With a tight beam, pushing keeps LM-favored paths that
        non-pushing may prune (the point of the optimization): at minimum
        it must not crash and must produce a result with sane beams."""
        models = toy["models"]
        T = 30
        sc = scores_matrix(models, T, seed=33)
        art = DecoderArtifact(toy["cl_net"], models)
        pushed = TpuDecoder(
            art,
            TpuDecoderConfig(max_insts=256, expand_budget=1024, final_budget=256,
                             dtype="float64", otf_pushing=True,
                             emit_prune_win=200.0, phone_end_prune_win=150.0,
                             word_prune_win=150.0),
            g_network=toy["g_net"],
        )
        r = pushed.decode_scores(sc)
        assert not r.empty

    def test_otf_lattice(self, toy):
        from juicer_tpu.fst import algos as A

        models = toy["models"]
        T = 30
        sc = scores_matrix(models, T, seed=33)
        art = DecoderArtifact(toy["cl_net"], models)
        dec = TpuDecoder(
            art,
            TpuDecoderConfig(max_insts=256, expand_budget=1024, final_budget=256,
                             dtype="float64", gen_lattice=True),
            g_network=toy["g_net"],
        )
        res, lat = dec.decode_scores_lattice(sc)
        assert not res.empty
        cost, il, ol = A.shortest_path(lat)
        assert ol == res.words
        assert abs(cost - (-(res.acoustic_score + res.lm_score))) < 1e-6

    def test_matches_static_clg_words(self, toy):
        """OTF decode must produce the same 1-best WORDS as the statically
        composed CLG (scores differ: det/min in the log semiring
        redistributes weights)."""
        models = toy["models"]
        T = 30
        sc = scores_matrix(models, T, seed=33)
        art = DecoderArtifact(toy["cl_net"], models)
        dec = TpuDecoder(
            art,
            TpuDecoderConfig(max_insts=256, expand_budget=1024, final_budget=256,
                             dtype="float64"),
            g_network=toy["g_net"],
        )
        r_otf = dec.decode_scores(sc)
        static_art = DecoderArtifact(toy["clg_net"], models)
        static = TpuDecoder(
            static_art,
            TpuDecoderConfig(max_insts=256, expand_budget=1024, final_budget=256,
                             dtype="float64"),
        )
        r_static = static.decode_scores(sc)
        assert r_otf.words == r_static.words
        assert not r_otf.empty
