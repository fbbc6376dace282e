"""Harness tests: feature IO, edit distance, batch tester, CLI end-to-end."""

import math
import os

import numpy as np
import pytest

from juicer_tpu.harness import (
    EditDistance,
    align,
    read_htk,
    read_lna,
    write_htk,
    write_lna,
)
from juicer_tpu.harness.batch import BatchTester, OutputFormat, UtteranceSpec


class TestFeatures:
    def test_htk_roundtrip(self, tmp_path):
        feats = np.random.default_rng(0).normal(size=(17, 13)).astype(np.float32)
        p = str(tmp_path / "x.mfc")
        write_htk(p, feats, samp_period=100000, parm_kind=6)
        got, period, kind = read_htk(p)
        np.testing.assert_allclose(got, feats, rtol=1e-6)
        assert period == 100000
        assert kind == 6

    def test_lna_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        post = rng.dirichlet(np.ones(8), size=10)
        logp = np.log(np.maximum(post, 1e-4)).astype(np.float32)
        p = str(tmp_path / "x.lna")
        write_lna(p, logp)
        got = read_lna(p, 8)
        assert got.shape == (10, 8)
        # 8-bit quantization: ~1/24 resolution
        np.testing.assert_allclose(got, np.maximum(logp, -255.5 / 24), atol=0.05)


class TestEditDistance:
    def test_align_counts(self):
        ins, dele, sub = align([1, 2, 3], [1, 2, 3])
        assert (ins, dele, sub) == (0, 0, 0)
        ins, dele, sub = align([1, 9, 3], [1, 2, 3])
        assert (ins, dele, sub) == (0, 0, 1)
        ins, dele, sub = align([1, 2], [1, 2, 3])
        assert (ins, dele, sub) == (0, 1, 0)
        ins, dele, sub = align([1, 2, 3, 4], [1, 2, 3])
        assert (ins, dele, sub) == (1, 0, 0)

    def test_accuracy(self):
        ed = EditDistance(7, 7, 10)
        ed.distance([1, 2, 3], [1, 2, 3])
        ed.distance([1, 9], [1, 2, 3])
        assert ed.n_ref == 6
        assert abs(ed.accuracy - (6 - 1 - 1) / 6) < 1e-9
        assert ed.n_sent_correct == 1

    def test_spec_parse(self):
        s = UtteranceSpec.parse("utt1=path/to/file.mfc[10,99]")
        assert s.name == "utt1" and s.start_frame == 10 and s.end_frame == 99
        s2 = UtteranceSpec.parse("path/to/abc.mfc")
        assert s2.name == "abc" and s2.start_frame == -1


class TestCliEndToEnd:
    def test_full_pipeline(self, tmp_path):
        """gramgen -> lexgen -> cdgen -> build-wfst -> juicer on synthetic
        audio; checks WER == 0 on clean synthesized features."""
        from juicer_tpu.cli import gramgen, lexgen, cdgen, build_wfst, juicer, genwfstseqs
        from juicer_tpu.am import AcousticModelSet
        from juicer_tpu.am.mmf import (
            MmfDef, MmfHmm, MmfMixture, MmfState, MmfTransMat, write_mmf,
        )

        td = str(tmp_path)
        lexf = os.path.join(td, "lex.dict")
        with open(lexf, "w") as fd:
            fd.write("a(1.0) ah\ncat k ae t\n<s> sil\n</s> sil\n")
        phonesf = os.path.join(td, "phones.lst")
        phones = ["ah", "k", "ae", "t", "sil"]
        with open(phonesf, "w") as fd:
            fd.write("\n".join(phones) + "\n")
        arpaf = os.path.join(td, "lm.arpa")
        with open(arpaf, "w") as fd:
            fd.write(
                "\\data\\\nngram 1=4\nngram 2=3\n\n\\1-grams:\n"
                "-0.60206 </s>\n-99 <s> -0.30103\n-0.47712 a -0.30103\n"
                "-0.60206 cat -0.30103\n\n\\2-grams:\n-0.30103 <s> a\n"
                "-0.47712 a cat\n-0.30103 cat </s>\n\n\\end\\\n"
            )

        # random well-separated GMM models, written as a real MMF
        rng = np.random.default_rng(0)
        D = 8
        d = MmfDef()
        d.global_opts.vec_size = D
        for name in phones:
            probs = np.zeros((5, 5))
            probs[0, 1] = 1
            for j in range(1, 4):
                probs[j, j] = 0.5
                probs[j, j + 1] = 0.5
            center = rng.normal(scale=6.0, size=D)
            sts = [
                MmfState(mixtures=[MmfMixture(1.0, center + rng.normal(scale=0.5, size=D),
                                              np.ones(D))])
                for _ in range(3)
            ]
            d.hmms.append(MmfHmm(name, 5, sts, MmfTransMat(None, 5, probs)))
        mmff = os.path.join(td, "models.mmf")
        write_mmf(d, mmff)

        # G, L, C via the CLIs
        assert gramgen.main([
            "-lexFName", lexf, "-sentStartWord", "<s>", "-sentEndWord", "</s>",
            "-gramType", "ngram", "-lmFName", arpaf,
            "-fsmFName", os.path.join(td, "g.fsm"),
            "-inSymsFName", os.path.join(td, "g.insyms"),
            "-outSymsFName", os.path.join(td, "g.outsyms"),
        ]) == 0
        assert lexgen.main([
            "-monoListFName", phonesf, "-silMonophone", "sil",
            "-lexFName", lexf, "-sentStartWord", "<s>", "-sentEndWord", "</s>",
            "-outputAuxPhones",
            "-fsmFName", os.path.join(td, "l.fsm"),
            "-inSymsFName", os.path.join(td, "l.insyms"),
            "-outSymsFName", os.path.join(td, "l.outsyms"),
        ]) == 0
        assert cdgen.main([
            "-cdType", "monophone", "-monoListFName", phonesf,
            "-htkModelsFName", mmff,
            "-lexInSymsFName", os.path.join(td, "l.insyms"),
            "-fsmFName", os.path.join(td, "c.fsm"),
            "-inSymsFName", os.path.join(td, "c.insyms"),
            "-outSymsFName", os.path.join(td, "c.outsyms"),
        ]) == 0
        assert build_wfst.main([
            os.path.join(td, "g.fsm"), os.path.join(td, "l.fsm"), os.path.join(td, "c.fsm"),
        ]) == 0
        assert os.path.exists(os.path.join(td, "final.fsm"))

        # sanity tool runs
        assert genwfstseqs.main([
            "-fsmFName", os.path.join(td, "final.fsm"),
            "-inSymsFName", os.path.join(td, "final.insyms"),
            "-outSymsFName", os.path.join(td, "final.outsyms"),
            "-nSeqs", "3",
        ]) == 0

        # synthesize HTK features for "<s> a cat </s>" = sil ah k ae t sil
        models = AcousticModelSet.from_mmf(mmff)
        frames = []
        for p in ["sil", "ah", "k", "ae", "t", "sil"]:
            h = models.get_hmm_index(p)
            for j in range(1, 4):
                g = int(models.hmm_gmm_inds[h][j - 1])
                mu = models.gmm_means[g][0]
                for _ in range(3):
                    frames.append(mu + rng.normal(scale=0.3, size=D))
        write_htk(os.path.join(td, "utt1.mfc"), np.asarray(frames))

        with open(os.path.join(td, "input.lst"), "w") as fd:
            fd.write(os.path.join(td, "utt1.mfc") + "\n")
        with open(os.path.join(td, "refs.txt"), "w") as fd:
            fd.write("<s> a cat </s>\n")

        outf = os.path.join(td, "out.txt")
        assert juicer.main([
            "-lexFName", lexf, "-sentStartWord", "<s>", "-sentEndWord", "</s>",
            "-fsmFName", os.path.join(td, "final.fsm"),
            "-inSymsFName", os.path.join(td, "final.insyms"),
            "-outSymsFName", os.path.join(td, "final.outsyms"),
            "-htkModelsFName", mmff,
            "-inputFName", os.path.join(td, "input.lst"),
            "-refFName", os.path.join(td, "refs.txt"),
            "-outputFName", outf,
            "-outputFormat", "verbose",
        ]) == 0
        text = open(outf).read()
        assert "Actual :    <s> a cat </s>" in text
        assert "Word accuracy = 100.00%" in text

        # MLF output format
        mlf = os.path.join(td, "out.mlf")
        assert juicer.main([
            "-lexFName", lexf, "-sentStartWord", "<s>", "-sentEndWord", "</s>",
            "-fsmFName", os.path.join(td, "final.fsm"),
            "-inSymsFName", os.path.join(td, "final.insyms"),
            "-outSymsFName", os.path.join(td, "final.outsyms"),
            "-htkModelsFName", mmff,
            "-inputFName", os.path.join(td, "input.lst"),
            "-outputFName", mlf,
            "-outputFormat", "xmlf",
            "-removeSentMarks",
        ]) == 0
        mtext = open(mlf).read()
        assert mtext.startswith("#!MLF!#")
        assert '"*/utt1.rec"' in mtext
        assert " a " in mtext and " cat " in mtext
        assert "<s>" not in mtext  # removeSentMarks
