"""End-to-end: trigram ARPA + cross-word triphones + tied list -> CLG ->
decode, at a scale that exercises backoff-path completion and the
deterministic-inverse C construction inside the full pipeline."""

import itertools
import math
import os

import numpy as np
import pytest

import jax

from juicer_tpu.fst import Fst, LOG, TROPICAL, algos
from juicer_tpu.lexicon import Lexicon
from juicer_tpu.compile import (
    CDGen, CDPhoneLookup, CDType, GramGen, GramType, LexGen, build_clg,
)
from juicer_tpu.am import AcousticModelSet
from juicer_tpu.am.mmf import MmfDef, MmfHmm, MmfMixture, MmfState, MmfTransMat
from juicer_tpu.decoder import DecoderNetwork, RefDecoder, TpuDecoder
from juicer_tpu.decoder.artifact import DecoderArtifact
from juicer_tpu.decoder.tpu_core import TpuDecoderConfig


@pytest.fixture(scope="module", autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


PHONES = ["a", "b", "c", "d", "sil"]
WORDS = {
    "wa": ["a", "b"],
    "wb": ["b", "c"],
    "wc": ["c", "a", "d"],
    "wd": ["d"],
}


def build_resources(tmp_path):
    lex_lines = [f"{w} {' '.join(p)}" for w, p in WORDS.items()]
    lex_lines += ["<s> sil", "</s> sil"]
    (tmp_path / "lex.dict").write_text("\n".join(lex_lines) + "\n")
    (tmp_path / "phones.lst").write_text("\n".join(PHONES) + "\n")

    # trigram LM over the 4 words with partial coverage (forces backoff
    # paths incl. default-backoff completion for missing contexts)
    words = list(WORDS)
    lines = ["\\data\\", "ngram 1=6", "ngram 2=6", "ngram 3=4", "", "\\1-grams:"]
    lines += ["-0.9 </s>", "-99 <s> -0.5"]
    for w in words:
        lines.append(f"-0.8 {w} -0.4")
    lines += ["", "\\2-grams:"]
    lines += [
        "-0.4 <s> wa -0.3",
        "-0.5 wa wb -0.3",
        "-0.6 wb wc -0.3",
        "-0.5 wc wd -0.3",
        "-0.7 wd </s>",
        "-0.6 wb </s>",
    ]
    lines += ["", "\\3-grams:"]
    lines += [
        "-0.2 <s> wa wb",
        "-0.3 wa wb wc",
        "-0.4 wb wc wd",
        "-0.3 wc wd </s>",
    ]
    lines += ["", "\\end\\", ""]
    (tmp_path / "lm.arpa").write_text("\n".join(lines))

    lex = Lexicon.load(
        str(tmp_path / "phones.lst"), str(tmp_path / "lex.dict"),
        sil_phone="sil", sent_start_word="<s>", sent_end_word="</s>",
        spec_word_char="",
    )
    return lex


def triphone_models(lookup, seed=0):
    """Random GMM models for every physical model name in the lookup."""
    names = sorted(set(lookup.logical_to_physical.values()))
    rng = np.random.default_rng(seed)
    D = 8
    d = MmfDef()
    d.global_opts.vec_size = D
    for name in names:
        probs = np.zeros((5, 5))
        probs[0, 1] = 1
        for j in range(1, 4):
            probs[j, j] = 0.5
            probs[j, j + 1] = 0.5
        center = rng.normal(scale=5.0, size=D)
        sts = [
            MmfState(mixtures=[MmfMixture(1.0, center + rng.normal(scale=0.5, size=D),
                                          np.ones(D))])
            for _ in range(3)
        ]
        d.hmms.append(MmfHmm(name, 5, sts, MmfTransMat(None, 5, probs)))
    return AcousticModelSet.from_def(d), names


class TestTriphoneTrigramE2E:
    def test_full_pipeline(self, tmp_path):
        lex = build_resources(tmp_path)
        ps = lex.phone_set
        sil = ps.sil_index

        # G (trigram, with backoff completion paths)
        G = GramGen(lex.vocab, GramType.NGRAM,
                    lm_fname=str(tmp_path / "lm.arpa")).build()
        assert G.num_states > 8  # trigram context states exist

        # L with aux phones
        lg = LexGen(lex)
        L = lg.build(output_aux_phones=True)

        # cross-word triphone inventory: all l-c+r seen in any cross-word
        # phone sequence, plus "sil"
        nonsil = [p for p in range(len(ps)) if p != sil]
        tied = set()
        for l in range(len(ps)):
            for c in nonsil:
                for r in range(len(ps)):
                    tied.add(f"{ps[l]}-{ps[c]}+{ps[r]}")
        tied.add("sil")
        tied_list = sorted(tied)
        lookup = CDPhoneLookup(ps)
        lookup.add_phones(tied_list)
        lookup.bind_models(tied_list)
        lookup.verify_all_models()
        gen = CDGen(CDType.XWORD_TRIPHONE, lookup, tied_list, n_aux_syms=lg.n_aux)
        C = gen.build(ci_pause=False)

        result = build_clg(G, L, C)
        clg = result.clg
        assert clg.num_states > 0

        models, names = triphone_models(lookup)
        net = DecoderNetwork(clg, clg.isyms, clg.osyms)
        art = DecoderArtifact(net, models)

        # synthesize features for "<s> wa wb </s>": phone string
        # sil a b b c sil with cross-word triphone models
        phone_seq = ["sil", "a", "b", "b", "c", "sil"]
        tri = []
        for i, p in enumerate(phone_seq):
            if p == "sil":
                tri.append("sil")
            else:
                lft = phone_seq[i - 1]
                rgt = phone_seq[i + 1]
                tri.append(f"{lft}-{p}+{rgt}")
        rng = np.random.default_rng(7)
        frames = []
        for name in tri:
            h = models.get_hmm_index(name)
            assert h >= 0, name
            for j in range(1, 4):
                g = int(models.hmm_gmm_inds[h][j - 1])
                mu = models.gmm_means[g][0]
                for _ in range(3):
                    frames.append(mu + rng.normal(scale=0.3, size=len(mu)))
        feats = np.asarray(frames)
        sc = np.stack([models.score_all(f) for f in feats])

        dec = TpuDecoder(
            art,
            TpuDecoderConfig(max_insts=512, expand_budget=2048, final_budget=512,
                             dtype="float64"),
        )
        res = dec.decode_scores(sc)
        assert not res.empty
        words = [net.out_syms[w] for w in res.words]
        assert words == ["<s>", "wa", "wb", "</s>"], words

        # oracle agreement on the same network
        ref = RefDecoder(net, models)
        r_ref = ref.decode(score_fn=lambda t, g: float(sc[t, g]), n_frames=len(sc))
        assert [net.out_syms[w] for w in r_ref.words] == words
        assert abs(r_ref.score - res.score) < 1e-6

    def test_trigram_g_scores(self, tmp_path):
        """The G machine gives LM-consistent path weights incl. trigram hits
        and backoff fallbacks."""
        lex = build_resources(tmp_path)
        v = lex.vocab
        G = GramGen(v, GramType.NGRAM, lm_fname=str(tmp_path / "lm.arpa")).build()
        ln10 = math.log(10.0)
        ids = [v.get_index(w) + 1 for w in ["<s>", "wa", "wb", "wc", "wd", "</s>"]]
        w = algos.string_weight(G, ids, TROPICAL)
        # all transitions covered by 2/3-grams on the best path:
        # p(wa|<s>) p(wb|<s> wa) p(wc|wa wb) p(wd|wb wc) p(</s>|wc wd)
        expect = -(-0.4 - 0.2 - 0.3 - 0.4 - 0.3) * ln10
        assert abs(w - expect) < 1e-4
