"""Speaker-adaptation transform tests."""

import numpy as np
import pytest

from juicer_tpu.am.xform import InputXform, SpeakerXforms, parse_xform

XFORM = """\
~a "spk1.xform"
<ADAPTKIND> BASE
<BASECLASS> ~b "global"
<XFORMSET>
<XFORMKIND> CMLLR
<NUMXFORMS> 1
<LINXFORM> 1
<VECSIZE> 4
<OFFSET>
<BIAS> 4
 0.1 -0.2 0.3 0.0
<LOGDET> 1.25
<BLOCKINFO> 2 2 2
<BLOCK> 1
<XFORM> 2 2
 1.0 0.5
 0.0 2.0
<BLOCK> 2
<XFORM> 2 2
 0.5 0.0
 0.1 1.0
"""


class TestXform:
    def test_parse(self, tmp_path):
        p = tmp_path / "spk1.xform"
        p.write_text(XFORM)
        xf = parse_xform(str(p))
        assert xf.A.shape == (4, 4)
        assert xf.logdet == 1.25
        np.testing.assert_allclose(xf.b, [0.1, -0.2, 0.3, 0.0])
        # block-diagonal placement
        np.testing.assert_allclose(xf.A[:2, :2], [[1.0, 0.5], [0.0, 2.0]])
        np.testing.assert_allclose(xf.A[2:, 2:], [[0.5, 0.0], [0.1, 1.0]])
        np.testing.assert_allclose(xf.A[:2, 2:], 0.0)

    def test_apply(self, tmp_path):
        p = tmp_path / "s.xform"
        p.write_text(XFORM)
        xf = parse_xform(str(p))
        x = np.array([[1.0, 2.0, 3.0, 4.0]])
        y = xf.apply(x)
        expect = xf.A @ x[0] + xf.b
        np.testing.assert_allclose(y[0], expect)

    def test_speaker_lookup(self, tmp_path):
        (tmp_path / "spk1.xform").write_text(XFORM)
        sx = SpeakerXforms(str(tmp_path), ".xform", r"^(\w+)_")
        xf = sx.for_utterance("spk1_utt003")
        assert xf is not None
        assert sx.for_utterance("unknown_utt") is None
        # cache hit path
        assert sx.for_utterance("spk1_utt004") is xf

    def test_model_space_mllr(self, tmp_path):
        """Mean-transformed models score like manually shifted Gaussians."""
        import sys, os

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_decoder import make_models

        models = make_models(3, n_emit=2, dim=4, n_comps=2, seed=1)
        p = tmp_path / "s.xform"
        p.write_text(XFORM)
        xf = parse_xform(str(p))
        adapted = models.with_mean_transform(xf.A, xf.b)
        x = np.array([0.3, -0.1, 0.7, 0.2])
        for g in range(models.n_gmms):
            # score of adapted model on x == original gaussian with mean A μ+b
            mu0 = models.gmm_means[g]
            np.testing.assert_allclose(
                adapted.gmm_means[g], mu0 @ xf.A.T + xf.b[None, :]
            )
            assert np.isfinite(adapted.score_gmm(g, x))
        # original set untouched
        assert not np.allclose(models.gmm_means[0], adapted.gmm_means[0])

    def test_harness_applies_xform(self, tmp_path):
        from juicer_tpu.harness.batch import BatchTester, UtteranceSpec

        (tmp_path / "spk1.xform").write_text(XFORM)
        sx = SpeakerXforms(str(tmp_path), ".xform", r"^(\w+?)_")
        feats = np.ones((3, 4), np.float32)
        applied = {}

        def decode_fn(f):
            applied["feats"] = f
            from juicer_tpu.decoder.ref_core import DecodeResult

            return DecodeResult([], [], -1e30, -1e30, -1e30, len(f))

        bt = BatchTester(decode_fn, word_names=[], speaker_xforms=sx,
                         output_file="stdout", feature_kind="npy")
        spec = UtteranceSpec(name="spk1_u1", features=feats)
        bt.run([spec])
        xf = parse_xform(str(tmp_path / "spk1.xform"))
        np.testing.assert_allclose(applied["feats"], xf.apply(feats), rtol=1e-6)


class TestParentXform:
    def test_cascade_semantics(self, tmp_path):
        """Parent transform applies FIRST (HTKLib xfInfo.paXFormDir):
        x' = A (Ap x + bp) + b, composed once and cached."""
        pdir = tmp_path / "parent"
        sdir = tmp_path / "spk"
        pdir.mkdir(); sdir.mkdir()
        (pdir / "spk1.xform").write_text(XFORM)
        (sdir / "spk1.xform").write_text(XFORM)
        parent = SpeakerXforms(str(pdir), ".xform", r"^(\w+?)_")
        sx = SpeakerXforms(str(sdir), ".xform", r"^(\w+?)_", parent=parent)
        xf = sx.for_utterance("spk1_utt0")
        single = parse_xform(str(sdir / "spk1.xform"))
        x = np.arange(4.0)
        np.testing.assert_allclose(
            xf.apply(x[None]), single.apply(single.apply(x[None])),
            rtol=1e-12,
        )
        assert xf.logdet == pytest.approx(2 * single.logdet)

    def test_parent_only(self, tmp_path):
        pdir = tmp_path / "parent"
        pdir.mkdir()
        (pdir / "spk1.xform").write_text(XFORM)
        parent = SpeakerXforms(str(pdir), ".xform", r"^(\w+?)_")
        sx = SpeakerXforms(str(tmp_path / "none"), ".xform", r"^(\w+?)_",
                           parent=parent)
        xf = sx.for_utterance("spk1_utt0")
        single = parse_xform(str(pdir / "spk1.xform"))
        x = np.arange(4.0)
        np.testing.assert_allclose(xf.apply(x[None]), single.apply(x[None]))
