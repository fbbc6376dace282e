"""Tests for lexical resources, ARPA LM, and acoustic models."""

import math
import os

import numpy as np
import pytest

from juicer_tpu.lexicon import Lexicon, PhoneSet, Vocabulary
from juicer_tpu.lm import ArpaLM, WordPairLM
from juicer_tpu.am import AcousticModelSet, parse_mmf, write_mmf
from juicer_tpu.am.models import LOG_ZERO


LEX = """\
# comment line
a(0.7) ah
a(0.3) ey
cat k ae t
dog d ao g
!sent_start sil
!sent_end sil
"""

PHONES = "ah\ney\nk\nae\nt\nd\nao\ng\nsil\nsp\n"

ARPA = """\
some header junk

\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-0.60206 </s>
-99 <s> -0.30103
-0.47712 a -0.30103
-0.60206 cat -0.30103
-0.69897 dog -0.30103

\\2-grams:
-0.30103 <s> a
-0.47712 a cat
-0.60206 a dog
-0.30103 cat </s>

\\end\\
"""


@pytest.fixture
def tmp_resources(tmp_path):
    lex = tmp_path / "lex.dict"
    lex.write_text(LEX)
    phones = tmp_path / "phones.lst"
    phones.write_text(PHONES)
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    return dict(lex=str(lex), phones=str(phones), arpa=str(arpa))


class TestVocabulary:
    def test_sorted_unique_with_specials(self, tmp_resources):
        v = Vocabulary(tmp_resources["lex"], "!", "!sent_start", "!sent_end", None)
        assert v.words == sorted(v.words)
        assert v.get_index("a") >= 0
        assert v.get_index("cat") >= 0
        assert v.get_num_pronuns(v.get_index("a")) == 2
        assert v.sent_start_index == v.get_index("!sent_start")
        assert v.is_special(v.sent_start_index)
        assert not v.is_special(v.get_index("cat"))
        assert v.get_index("zebra") == -1


class TestPhoneSet:
    def test_plain_list(self, tmp_resources):
        p = PhoneSet(tmp_resources["phones"], sil_name="sil", pause_name="sp")
        assert len(p) == 10
        assert p.get_index("sil") == p.sil_index
        assert p.get_index("sp") == p.pause_index

    def test_missing_sil_raises(self, tmp_resources):
        with pytest.raises(ValueError):
            PhoneSet(tmp_resources["phones"], sil_name="nosuch")


class TestLexicon:
    def test_load_entries(self, tmp_resources):
        lex = Lexicon.load(
            tmp_resources["phones"], tmp_resources["lex"],
            sil_phone="sil", pause_phone="sp",
            sent_start_word="!sent_start", sent_end_word="!sent_end",
        )
        v = lex.vocab
        a = v.get_index("a")
        assert len(lex.vocab_to_lex[a]) == 2
        e0 = lex.entries[lex.vocab_to_lex[a][0]]
        assert abs(e0.log_prior - math.log(0.7)) < 1e-9
        cat = v.get_index("cat")
        ec = lex.entries[lex.vocab_to_lex[cat][0]]
        assert [lex.phone_set[p] for p in ec.phones] == ["k", "ae", "t"]
        assert lex.sent_start_entry >= 0 and lex.sent_end_entry >= 0

    def test_normalise_pronuns(self, tmp_resources):
        lex = Lexicon.load(
            tmp_resources["phones"], tmp_resources["lex"],
            sil_phone="sil", pause_phone="sp",
        )
        # skew priors then normalize
        a = lex.vocab.get_index("a")
        lex.normalise_pronuns()
        tot = sum(math.exp(lex.entries[i].log_prior) for i in lex.vocab_to_lex[a])
        assert abs(tot - 1.0) < 1e-9


class TestArpa:
    def test_read_and_score(self, tmp_resources):
        v = Vocabulary(tmp_resources["lex"], "!", "<s>", "</s>", None)
        v.add_word("<s>", special=True)
        v.add_word("</s>", special=True)
        lm = ArpaLM(tmp_resources["arpa"], v, unk_word=None)
        assert lm.order == 2
        a = v.get_index("a")
        cat = v.get_index("cat")
        ln10 = math.log(10.0)
        p, bo = lm.get((a,))
        assert abs(p - (-0.47712 * ln10)) < 1e-5
        assert abs(bo - (-0.30103 * ln10)) < 1e-5
        # bigram
        p2, _ = lm.get((a, cat))
        assert abs(p2 - (-0.47712 * ln10)) < 1e-5
        # backoff evaluation: dog cat unseen -> bo(dog) + p(cat)
        dog = v.get_index("dog")
        s = lm.score((dog, cat))
        assert abs(s - ((-0.30103 + -0.60206) * ln10)) < 1e-4

    def test_unk_words(self, tmp_resources):
        # vocabulary word missing from LM without <unk> -> error
        v = Vocabulary(tmp_resources["lex"], "!", "<s>", "</s>", None)
        v.add_word("<s>", special=True)
        v.add_word("</s>", special=True)
        v.add_word("zzz")
        with pytest.raises(ValueError):
            ArpaLM(tmp_resources["arpa"], v, unk_word=None)
        lm = ArpaLM(tmp_resources["arpa"], v, unk_word="<unk>")
        assert v.get_index("zzz") in lm.unk_words

    def test_normalise(self, tmp_resources):
        v = Vocabulary(tmp_resources["lex"], "!", "<s>", "</s>", None)
        v.add_word("<s>", special=True)
        v.add_word("</s>", special=True)
        lm = ArpaLM(tmp_resources["arpa"], v, unk_word=None)
        lm.normalise()
        # unigram probs must now sum to one
        tot = sum(math.exp(p) for p, _ in lm.entries[0].values() if p > LOG_ZERO)
        assert abs(tot - 1.0) < 1e-6
        # each context's backoff = log(1 - ngram mass)
        a = v.get_index("a")
        cat = v.get_index("cat")
        dog = v.get_index("dog")
        mass = math.exp(lm.get((a, cat))[0]) + math.exp(lm.get((a, dog))[0])
        assert abs(lm.get((a,))[1] - math.log(1 - mass)) < 1e-6


class TestWordPair:
    def test_parse(self, tmp_path, tmp_resources):
        f = tmp_path / "wp.grammar"
        f.write_text("/* comment\nblock */\n>!sent_start\ncat dog\n>cat\n!sent_end\n>dog\n!sent_end\n")
        v = Vocabulary(tmp_resources["lex"], "!", "!sent_start", "!sent_end", None)
        wp = WordPairLM(str(f), v)
        cat, dog = v.get_index("cat"), v.get_index("dog")
        assert set(wp.get_successors(v.sent_start_index)) == {cat, dog}
        assert wp.get_successors(cat) == [v.sent_end_index]


MMF = """\
~o <STREAMINFO> 1 3 <VECSIZE> 3 <NULLD><MFCC><DIAGC>
~v "varFloor1"
<VARIANCE> 3
 1e-2 1e-2 1e-2
~t "shared_t"
<TRANSP> 5
 0.0 1.0 0.0 0.0 0.0
 0.0 0.6 0.4 0.0 0.0
 0.0 0.0 0.6 0.4 0.0
 0.0 0.0 0.0 0.6 0.4
 0.0 0.0 0.0 0.0 0.0
~s "shared_s"
<NUMMIXES> 2
<MIXTURE> 1 0.5
<MEAN> 3
 0.0 0.0 0.0
<VARIANCE> 3
 1.0 1.0 1.0
<MIXTURE> 2 0.5
<MEAN> 3
 1.0 1.0 1.0
<VARIANCE> 3
 2.0 2.0 2.0
~h "aa"
<BEGINHMM>
<NUMSTATES> 5
<STATE> 2
~s "shared_s"
<STATE> 3
<MEAN> 3
 0.5 0.5 0.5
<VARIANCE> 3
 1.0 1.0 1.0
<STATE> 4
~s "shared_s"
~t "shared_t"
<ENDHMM>
~h "bb"
<BEGINHMM>
<NUMSTATES> 4
<STATE> 2
<MEAN> 3
 -1.0 0.0 1.0
<VARIANCE> 3
 0.5 0.5 0.5
<STATE> 3
<MEAN> 3
 2.0 2.0 2.0
<VARIANCE> 3
 1.5 1.5 1.5
<TRANSP> 4
 0.0 0.9 0.0 0.1
 0.0 0.5 0.5 0.0
 0.0 0.0 0.5 0.5
 0.0 0.0 0.0 0.0
<ENDHMM>
"""


class TestMMF:
    def test_parse_structure(self):
        d = parse_mmf(MMF, is_text=True)
        assert d.global_opts.vec_size == 3
        assert d.global_opts.cov_kind == "DIAGC"
        assert len(d.hmms) == 2
        assert d.hmms[0].n_states == 5
        assert d.hmms[0].states[0] == "shared_s"
        assert "varFloor1" in d.var_floors
        assert "shared_t" in d.sh_transmats

    def test_model_set(self):
        ms = AcousticModelSet.from_def(parse_mmf(MMF, is_text=True))
        assert ms.n_hmms == 2
        assert ms.get_num_states(0) == 5
        assert ms.get_num_states(1) == 4
        # shared state dedup: aa uses shared_s twice -> same gmm index
        gi = ms.hmm_gmm_inds[0]
        assert gi[0] == gi[2]
        # tee: bb has 0->3 prob 0.1
        assert abs(ms.get_tee_log_prob(1) - math.log(0.1)) < 1e-9
        assert ms.get_tee_log_prob(0) <= LOG_ZERO

    def test_se_index(self):
        ms = AcousticModelSet.from_def(parse_mmf(MMF, is_text=True))
        se = ms.get_se_index(1)  # bb: states 1..3
        # state 1 preds: 0 (entry), 1 (self) -> [0, 2)
        assert se[0] == (0, 2)
        # state 2 preds: 1, 2 -> [1, 3)
        assert se[1] == (1, 3)
        # exit state 3: preds from emitting only: 2 -> [2, 3) (tee excluded)
        assert se[2] == (2, 3)

    def test_gmm_score_matches_naive(self):
        ms = AcousticModelSet.from_def(parse_mmf(MMF, is_text=True))
        x = np.array([0.3, -0.2, 0.8])
        # manual: 2-comp gmm of shared_s
        def gauss(x, mu, var):
            return float(
                -0.5 * np.sum((x - mu) ** 2 / var)
                - 0.5 * (len(x) * math.log(2 * math.pi) + np.sum(np.log(var)))
            )
        g0 = gauss(x, np.zeros(3), np.ones(3)) + math.log(0.5)
        g1 = gauss(x, np.ones(3), 2 * np.ones(3)) + math.log(0.5)
        expect = np.logaddexp(g0, g1)
        got = ms.calc_output(0, 1, x)
        assert abs(got - expect) < 1e-9

    def test_roundtrip(self, tmp_path):
        d = parse_mmf(MMF, is_text=True)
        p = tmp_path / "out.mmf"
        write_mmf(d, p)
        d2 = parse_mmf(str(p))
        ms1 = AcousticModelSet.from_def(d)
        ms2 = AcousticModelSet.from_def(d2)
        x = np.array([0.1, 0.2, 0.3])
        for h in range(ms1.n_hmms):
            for j in range(1, ms1.get_num_states(h) - 1):
                assert abs(ms1.calc_output(h, j, x) - ms2.calc_output(h, j, x)) < 1e-6

    def test_npz_roundtrip(self, tmp_path):
        ms1 = AcousticModelSet.from_def(parse_mmf(MMF, is_text=True))
        p = str(tmp_path / "models.npz")
        ms1.save_npz(p)
        ms2 = AcousticModelSet.load_npz(p)
        x = np.array([0.1, 0.2, 0.3])
        assert ms2.hmm_names == ms1.hmm_names
        for h in range(ms1.n_hmms):
            for j in range(1, ms1.get_num_states(h) - 1):
                assert abs(ms1.calc_output(h, j, x) - ms2.calc_output(h, j, x)) < 1e-12
            np.testing.assert_allclose(ms1.get_trans_mat(h), ms2.get_trans_mat(h))

    def test_tmix_parses_scores_and_roundtrips(self, tmp_path):
        """<TMix> tied-mixture states (htkparse.y.ypp:516-544): shared ~m
        pool components + per-state weight vectors. Scoring must equal an
        equivalent untied MMF; write/parse must round-trip."""
        pool = """~o <VECSIZE> 2 <NULLD><DIAGC>
~m "tied1"
<MEAN> 2
 0.0 0.0
<VARIANCE> 2
 1.0 1.0
~m "tied2"
<MEAN> 2
 1.0 -1.0
<VARIANCE> 2
 2.0 0.5
~m "tied3"
<MEAN> 2
 -2.0 2.0
<VARIANCE> 2
 1.5 1.5
~h "tm"
<BEGINHMM>
<NUMSTATES> 4
<STATE> 2
<NUMMIXES> 3
<TMIX> tied 0.2 0.5 0.3
<STATE> 3
<NUMMIXES> 3
<TMIX> tied 0.6 0.0 0.4
<TRANSP> 4
 0.0 1.0 0.0 0.0
 0.0 0.5 0.5 0.0
 0.0 0.0 0.5 0.5
 0.0 0.0 0.0 0.0
<ENDHMM>
"""
        d = parse_mmf(pool, is_text=True)
        assert "tied" in d.mix_pools and len(d.mix_pools["tied"]) == 3
        st = d.hmms[0].states[0]
        assert st.tmix_pool == "tied"
        np.testing.assert_allclose(st.tmix_weights, [0.2, 0.5, 0.3])
        ms = AcousticModelSet.from_def(d)

        # equivalent untied model: same components inlined per state
        untied = pool.split('~h')[0].split('~m')[0] + """~h "tm"
<BEGINHMM>
<NUMSTATES> 4
<STATE> 2
<NUMMIXES> 3
<MIXTURE> 1 0.2
<MEAN> 2
 0.0 0.0
<VARIANCE> 2
 1.0 1.0
<MIXTURE> 2 0.5
<MEAN> 2
 1.0 -1.0
<VARIANCE> 2
 2.0 0.5
<MIXTURE> 3 0.3
<MEAN> 2
 -2.0 2.0
<VARIANCE> 2
 1.5 1.5
<STATE> 3
<NUMMIXES> 3
<MIXTURE> 1 0.6
<MEAN> 2
 0.0 0.0
<VARIANCE> 2
 1.0 1.0
<MIXTURE> 2 0.0
<MEAN> 2
 1.0 -1.0
<VARIANCE> 2
 2.0 0.5
<MIXTURE> 3 0.4
<MEAN> 2
 -2.0 2.0
<VARIANCE> 2
 1.5 1.5
<TRANSP> 4
 0.0 1.0 0.0 0.0
 0.0 0.5 0.5 0.0
 0.0 0.0 0.5 0.5
 0.0 0.0 0.0 0.0
<ENDHMM>
"""
        ms_ref = AcousticModelSet.from_def(parse_mmf(untied, is_text=True))
        rng = np.random.default_rng(3)
        for _ in range(5):
            x = rng.normal(size=2)
            for j in (1, 2):
                assert abs(ms.calc_output(0, j, x) - ms_ref.calc_output(0, j, x)) < 1e-12

        # round-trip through the writer preserves TMix structure + scores
        p = tmp_path / "tmix.mmf"
        write_mmf(d, p)
        d2 = parse_mmf(str(p))
        assert d2.hmms[0].states[0].tmix_pool == "tied"
        ms2 = AcousticModelSet.from_def(d2)
        x = np.array([0.3, -0.7])
        for j in (1, 2):
            assert abs(ms.calc_output(0, j, x) - ms2.calc_output(0, j, x)) < 1e-9

    def test_tmix_bad_pool_rejected(self):
        bad = """~o <VECSIZE> 2 <NULLD><DIAGC>
~h "x"
<BEGINHMM>
<NUMSTATES> 3
<STATE> 2
<NUMMIXES> 2
<TMIX> nosuch 0.5 0.5
<TRANSP> 3
 0.0 1.0 0.0
 0.0 0.5 0.5
 0.0 0.0 0.0
<ENDHMM>
"""
        from juicer_tpu.am.mmf import MMFParseError

        with pytest.raises(MMFParseError, match="pool"):
            parse_mmf(bad, is_text=True)

    def test_tmix_decodes(self):
        """A TMix model set drives a full decode (engine + oracle parity)."""
        import jax

        from juicer_tpu.fst import Fst, LOG
        from juicer_tpu.decoder import DecoderNetwork, RefDecoder, TpuDecoder
        from juicer_tpu.decoder.artifact import DecoderArtifact
        from juicer_tpu.decoder.tpu_core import TpuDecoderConfig

        mmf = """~o <VECSIZE> 2 <NULLD><DIAGC>
~m "p1"
<MEAN> 2
 0.0 0.0
<VARIANCE> 2
 1.0 1.0
~m "p2"
<MEAN> 2
 2.0 2.0
<VARIANCE> 2
 1.0 1.0
~h "a"
<BEGINHMM>
<NUMSTATES> 4
<STATE> 2
<NUMMIXES> 2
<TMIX> p 0.7 0.3
<STATE> 3
<NUMMIXES> 2
<TMIX> p 0.2 0.8
<TRANSP> 4
 0.0 1.0 0.0 0.0
 0.0 0.5 0.5 0.0
 0.0 0.0 0.5 0.5
 0.0 0.0 0.0 0.0
<ENDHMM>
~h "b"
<BEGINHMM>
<NUMSTATES> 4
<STATE> 2
<NUMMIXES> 2
<TMIX> p 0.5 0.5
<STATE> 3
<NUMMIXES> 2
<TMIX> p 0.9 0.1
<TRANSP> 4
 0.0 1.0 0.0 0.0
 0.0 0.5 0.5 0.0
 0.0 0.0 0.5 0.5
 0.0 0.0 0.0 0.0
<ENDHMM>
"""
        ms = AcousticModelSet.from_def(parse_mmf(mmf, is_text=True))
        f = Fst(LOG)
        s0, s1, s2 = (f.add_state() for _ in range(3))
        f.set_start(s0)
        f.add_arc(s0, s1, 1, 1, 0.0)
        f.add_arc(s1, s2, 2, 2, 0.0)
        f.set_final(s2, 0.0)
        net = DecoderNetwork(f)
        rng = np.random.default_rng(0)
        T = 8
        sc = np.stack([ms.score_all(rng.normal(size=2)) for _ in range(T)])
        jax.config.update("jax_enable_x64", True)
        try:
            r_ref = RefDecoder(net, ms).decode(
                score_fn=lambda t, g: float(sc[t, g]), n_frames=T)
            tpu = TpuDecoder(
                DecoderArtifact(net, ms),
                TpuDecoderConfig(max_insts=16, expand_budget=32,
                                 final_budget=16, dtype="float64"),
            )
            r_tpu = tpu.decode_scores(sc)
        finally:
            jax.config.update("jax_enable_x64", False)
        assert not r_ref.empty
        assert r_ref.words == r_tpu.words == [1, 2]
        assert abs(r_ref.score - r_tpu.score) < 1e-6

    def test_untie_models(self, tmp_path):
        """logical2physical.pl / untieModels.sh equivalent: one ~h per
        tied-list logical, body from the physical model, C-sorted order."""
        from juicer_tpu.am.mmf import untie_models

        d = parse_mmf(MMF, is_text=True)  # physical models: aa, bb
        tied = tmp_path / "tied.list"
        tied.write_text("z-aa+b aa\naa\na-bb+c bb\nbb\n")
        out = untie_models(d, str(tied))
        # byte-sorted: 'a-bb+c' < 'aa' < 'bb' < 'z-aa+b'
        assert [h.name for h in out.hmms] == ["a-bb+c", "aa", "bb", "z-aa+b"]
        ms_in = AcousticModelSet.from_def(d)
        ms_out = AcousticModelSet.from_def(out)
        x = np.array([0.4, -0.1, 0.2])
        # logical copies must score exactly like their physicals
        pairs = [("z-aa+b", "aa"), ("a-bb+c", "bb"), ("aa", "aa"), ("bb", "bb")]
        for logical, physical in pairs:
            hl = ms_out.get_hmm_index(logical)
            hp = ms_in.get_hmm_index(physical)
            assert ms_out.get_num_states(hl) == ms_in.get_num_states(hp)
            for j in range(1, ms_in.get_num_states(hp) - 1):
                assert abs(ms_out.calc_output(hl, j, x)
                           - ms_in.calc_output(hp, j, x)) < 1e-12
        # missing physical raises
        tied.write_text("x nosuch\n")
        with pytest.raises(KeyError):
            untie_models(d, str(tied))
        # round-trips through the writer
        from juicer_tpu.am.mmf import write_mmf as _w
        p = tmp_path / "untied.mmf"
        tied.write_text("z-aa+b aa\naa\n")
        _w(untie_models(d, str(tied)), p)
        d2 = parse_mmf(str(p))
        assert [h.name for h in d2.hmms] == ["aa", "z-aa+b"]

    def test_hybrid_mode(self):
        ms = AcousticModelSet.hybrid(["aa", "bb", "cc"], np.array([0.5, 0.3, 0.2]), 5)
        assert ms.n_hmms == 3
        assert ms.vec_size == 3
        x = np.log(np.array([0.6, 0.3, 0.1]))
        s = ms.calc_output(1, 2, x)
        assert abs(s - (math.log(0.3) - math.log(0.3))) < 1e-9
        assert ms.get_tee_log_prob(0) <= LOG_ZERO


class TestGmmTpuScoring:
    def test_dense_matches_oracle(self):
        from juicer_tpu.ops.gmm import make_gmm_scorer

        ms = AcousticModelSet.from_def(parse_mmf(MMF, is_text=True))
        params = ms.flat_params()
        scorer = make_gmm_scorer(params)
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(7, 3)).astype(np.float32)
        got = np.asarray(scorer(feats))
        for t in range(7):
            expect = ms.score_all(feats[t].astype(np.float64))
            np.testing.assert_allclose(got[t], expect, rtol=1e-4, atol=1e-4)
