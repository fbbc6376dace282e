"""Tests for G/L/C/H generation and the CLG pipeline."""

import math

import pytest

from juicer_tpu.fst import EPSILON, Fst, LOG, TROPICAL, algos
from juicer_tpu.fst.semiring import INF
from juicer_tpu.lexicon import Lexicon, PhoneSet, Vocabulary
from juicer_tpu.compile import (
    CDGen,
    CDPhoneLookup,
    CDType,
    GramGen,
    GramType,
    HmmGen,
    LexGen,
    build_clg,
)

LN10 = math.log(10.0)

LEX = """\
a(1.0) ah
cat k ae t
kat k ae t
dog d ao g
<s> sil
</s> sil
"""

PHONES = "ah\nk\nae\nt\nd\nao\ng\nsil\nsp\n"

ARPA = """\
\\data\\
ngram 1=6
ngram 2=3

\\1-grams:
-0.60206 </s>
-99 <s> -0.30103
-0.47712 a -0.30103
-0.60206 cat -0.30103
-0.69897 dog -0.30103
-0.90309 kat -0.30103

\\2-grams:
-0.30103 <s> a
-0.47712 a cat
-0.30103 cat </s>

\\end\\
"""


@pytest.fixture
def res(tmp_path):
    lex = tmp_path / "lex.dict"
    lex.write_text(LEX)
    phones = tmp_path / "phones.lst"
    phones.write_text(PHONES)
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    lexicon = Lexicon.load(
        str(phones), str(lex), sil_phone="sil", pause_phone="sp",
        sent_start_word="<s>", sent_end_word="</s>", spec_word_char="",
    )
    return dict(lexicon=lexicon, vocab=lexicon.vocab, arpa=str(arpa),
                phone_set=lexicon.phone_set)


def linear_acceptor(labels, sr=TROPICAL):
    f = Fst(sr)
    s = f.add_state()
    f.set_start(s)
    for lab in labels:
        t = f.add_state()
        f.add_arc(s, t, lab, lab, 0.0)
        s = t
    f.set_final(s, 0.0)
    return f


class TestGramGen:
    def test_arpa_structure_and_weights(self, res):
        v = res["vocab"]
        gg = GramGen(v, GramType.NGRAM, lm_fname=res["arpa"])
        g = gg.build()
        # <s> a cat </s> follows bigram arcs throughout:
        seq = [v.get_index(w) + 1 for w in ["<s>", "a", "cat", "</s>"]]
        w = algos.string_weight(g, seq, TROPICAL)
        expect = -(-0.30103 + -0.47712 + -0.30103) * LN10  # bigram probs as costs
        assert abs(w - expect) < 1e-4
        # a dog: dog after a must back off: bo(a) + p(dog)
        seq2 = [v.get_index(w) + 1 for w in ["<s>", "a", "dog"]]
        # final state reached? dog state is final (since no </s> bigram from
        # dog... dog has no bigram to </s>; final states: only (</s>) context
        # per haveFinal logic -> sequence can't terminate at dog
        w2 = algos.string_weight(g, seq2, TROPICAL)
        assert w2 == INF
        # but with </s> after dog: backoff dog -> eps -> p(</s>)
        seq3 = seq2 + [v.get_index("</s>") + 1]
        w3 = algos.string_weight(g, seq3, TROPICAL)
        expect3 = -(
            (-0.30103)  # p(a|<s>)
            + (-0.30103)  # bo(a)
            + (-0.69897)  # p(dog)
            + (-0.30103)  # bo(dog)
            + (-0.60206)  # p(</s>)
        ) * LN10
        assert abs(w3 - expect3) < 1e-4

    def test_wordloop(self, res):
        v = res["vocab"]
        gg = GramGen(v, GramType.WORDLOOP, word_ins_pen=0.0)
        g = gg.build()
        cat = v.get_index("cat") + 1
        a = v.get_index("a") + 1
        w = algos.string_weight(g, [cat, a, cat], TROPICAL)
        assert w != INF
        # each word costs log(nWords)
        assert abs(w - 3 * math.log(v.n_words)) < 1e-6

    def test_phi_backoff_label(self, res):
        v = res["vocab"]
        gg = GramGen(v, GramType.NGRAM, lm_fname=res["arpa"])
        g = gg.build(phi_bo_trans=True)
        assert gg.phi_label == v.n_words + 1
        phi_arcs = [i for i in range(g.num_arcs) if g.arc_ilabel[i] == gg.phi_label]
        assert phi_arcs, "phi backoff arcs missing"
        assert all(g.arc_olabel[i] == EPSILON for i in phi_arcs)
        assert g.isyms.find("#phi") == gg.phi_label


class TestLexGen:
    def test_homophones_get_aux(self, res):
        lg = LexGen(res["lexicon"])
        assert lg.n_aux >= 2  # cat & kat share k ae t
        l = lg.build(output_aux_phones=True)
        v = res["vocab"]
        ps = res["phone_set"]
        n_mono = len(ps)
        # find paths for cat & kat: same phones, different aux arc
        cat, kat = v.get_index("cat") + 1, v.get_index("kat") + 1
        phones = [ps.get_index(p) + 1 for p in ["k", "ae", "t"]]
        # compose with acceptor over phones + any aux
        got = {}
        for aux in range(lg.n_aux):
            acc = linear_acceptor(phones + [n_mono + aux + 1])
            c = algos.compose(acc, l)
            _, _, ol = algos.shortest_path(c)
            if ol:
                got[aux] = ol[0]
        assert set(got.values()) == {cat, kat}

    def test_word_on_first_arc_with_prior_weight(self, res):
        lex = res["lexicon"]
        lex.normalise_pronuns()
        lg = LexGen(lex)
        l = lg.build(output_aux_phones=False)
        v, ps = res["vocab"], res["phone_set"]
        a = v.get_index("a") + 1
        acc = linear_acceptor([ps.get_index("ah") + 1])
        cost, _, ol = algos.shortest_path(algos.compose(acc, l))
        assert ol == [a]
        assert abs(cost - 0.0) < 1e-6  # single pronun 'a' ah with prior 1.0


class TestCDGen:
    def test_monophone_identity(self, res):
        ps = res["phone_set"]
        lookup = CDPhoneLookup(ps)
        lookup.add_phones(list(ps.phones))
        model_names = list(ps.phones)
        lookup.bind_models(model_names)
        gen = CDGen(CDType.MONOPHONE, lookup, model_names)
        c = gen.build()
        assert c.num_states == 1
        # model i maps to phone i
        for i in range(c.num_arcs):
            assert c.arc_ilabel[i] == c.arc_olabel[i]

    def _tri_name(self, ps, l, c, r):
        return f"{ps[l]}-{ps[c]}+{ps[r]}"

    def test_xwrd_triphone_detinv(self, res):
        ps = res["phone_set"]
        sil = ps.sil_index
        # make a tiny triphone inventory over phones {ah, k} + sil
        ah, k = ps.get_index("ah"), ps.get_index("k")
        names = []
        for l in [sil, ah, k]:
            for c in [ah, k]:
                for r in [sil, ah, k]:
                    if r == sil:
                        names.append(f"{ps[l]}-{ps[c]}+{ps[sil]}")
                    else:
                        names.append(f"{ps[l]}-{ps[c]}+{ps[r]}")
        names.append("sil")
        model_names = sorted(set(names))
        lookup = CDPhoneLookup(ps)
        lookup.add_phones(model_names)
        lookup.bind_models(model_names)
        lookup.verify_all_models()
        gen = CDGen(CDType.XWORD_TRIPHONE, lookup, model_names)
        c = gen.build(ci_pause=False)
        # C maps model strings -> monophone strings; ask the inverse:
        # compose C with the phone-string acceptor on the output side
        phone_seq = [sil, ah, k, sil]
        acc = linear_acceptor([p + 1 for p in phone_seq])
        comp = algos.compose(c, acc)
        cost, il, _ = algos.shortest_path(comp)
        got_models = [model_names[i - 1] for i in il]
        assert got_models == ["sil", "sil-ah+k", "ah-k+sil", "sil"], got_models

    def test_xwrd_triphone_ndi(self, res):
        """Non-det-inverse variant: lookahead (center,right) states, output
        = center phone; needs ph2+ph3 / ph1-ph2 biphones."""
        ps = res["phone_set"]
        sil = ps.sil_index
        ah, k = ps.get_index("ah"), ps.get_index("k")
        model_names = sorted({
            "sil",
            "ah+k", "k+ah",            # word-initial biphones
            "ah-k", "k-ah",            # word-final biphones
            "sil-ah+k", "sil-k+ah",    # post-silence triphones
            "ah-k+sil", "k-ah+sil",    # pre-silence lookahead triphones
            "ah-k+ah", "k-ah+k",
        })
        lookup = CDPhoneLookup(ps)
        lookup.add_phones(model_names)
        lookup.bind_models(model_names)
        gen = CDGen(CDType.XWORD_TRIPHONE_NDI, lookup, model_names)
        c = gen.build(ci_pause=False)
        assert c.num_states > 0
        phone_seq = [sil, ah, k, sil]
        acc = linear_acceptor([p + 1 for p in phone_seq])
        comp = algos.compose(c, algos.project(acc))
        cost, il, _ = algos.shortest_path(comp)
        got = [model_names[i - 1] for i in il]
        assert got == ["sil", "sil-ah+k", "ah-k+sil", "sil"], got

    def test_aux_loops_present(self, res):
        ps = res["phone_set"]
        lookup = CDPhoneLookup(ps)
        lookup.add_phones(list(ps.phones))
        model_names = list(ps.phones)
        lookup.bind_models(model_names)
        gen = CDGen(CDType.MONOPHONE, lookup, model_names, n_aux_syms=2)
        c = gen.build()
        aux_in = [i for i in range(c.num_arcs) if c.arc_ilabel[i] > len(model_names)]
        assert len(aux_in) == 2  # one self-loop per aux per state (1 state)


class TestHmmGen:
    def test_shared_state_h(self):
        from juicer_tpu.am.mmf import parse_mmf

        MMF = """\
~o <STREAMINFO> 1 2 <VECSIZE> 2 <NULLD><MFCC><DIAGC>
~s "s1"
<MEAN> 2
 0.0 0.0
<VARIANCE> 2
 1.0 1.0
~h "aa"
<BEGINHMM>
<NUMSTATES> 3
<STATE> 2
~s "s1"
<TRANSP> 3
 0.0 1.0 0.0
 0.0 0.5 0.5
 0.0 0.0 0.0
<ENDHMM>
"""
        h = HmmGen(parse_mmf(MMF, is_text=True)).build()
        assert h.num_states == 2 + 3
        # a path exists: init -eps/aa-> entry -> s1... -> exit -> final
        _, il, ol = algos.shortest_path(h)
        assert ol == [1]  # hmm label
        assert all(x == 1 for x in il)  # s1 emissions


class TestPipeline:
    def test_toy_clg_end_to_end(self, res):
        v, ps, lexicon = res["vocab"], res["phone_set"], res["lexicon"]
        gg = GramGen(v, GramType.NGRAM, lm_fname=res["arpa"])
        G = gg.build()
        lg = LexGen(lexicon)
        L = lg.build(output_aux_phones=True)
        # monophone C covering phones + L's aux symbols
        lookup = CDPhoneLookup(ps)
        lookup.add_phones(list(ps.phones))
        model_names = list(ps.phones)
        lookup.bind_models(model_names)
        cg = CDGen(CDType.MONOPHONE, lookup, model_names, n_aux_syms=lg.n_aux)
        C = cg.build()
        result = build_clg(G, L, C)
        clg = result.clg
        assert clg.num_states > 0

        # "<s> a cat </s>" as models: sil ah k ae t sil
        models = [ps.get_index(p) + 1 for p in ["sil", "ah", "k", "ae", "t", "sil"]]
        acc = linear_acceptor(models)
        comp = algos.compose(acc, clg)
        cost, _, ol = algos.shortest_path(comp)
        words = [v.get_word(o - 1) for o in ol]
        # the trailing sil maps to </s> (pronounced sil); 'cat' beats the
        # homophone 'kat' because the LM has the bigram p(cat|a)
        assert words == ["<s>", "a", "cat", "</s>"], words

        # an unknown phone string must not compose
        bad = linear_acceptor([ps.get_index("d") + 1])
        assert algos.compose(bad, clg).num_states == 0
