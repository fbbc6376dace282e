"""Regression-class-tree MLLR adaptation tests (am/regtree.py)."""

import numpy as np

from juicer_tpu.am import AcousticModelSet, parse_mmf
from juicer_tpu.am.regtree import (
    apply_mllr_means,
    component_classes,
    parse_baseclass,
    parse_item_list,
    parse_regtree,
    parse_xformset,
)

from test_resources import MMF

BASECLASS = """\
~b "global"
<MMFIDMASK> *
<PARAMETERS> MIXBASE
<NUMCLASSES> 2
<CLASS> 1 {aa.state[2-4].mix[1-2]}
<CLASS> 2 {bb.state[2-3].mix[1]}
"""

REGTREE = """\
~r "rtree"
<BASECLASS> ~b "global"
<NODE> 1 2 2 3
<TNODE> 2 1 1
<TNODE> 3 1 2
"""

MLLR = """\
~a "spk.mllr"
<ADAPTKIND> TREE
<BASECLASS> ~b "global"
<XFORMSET>
<XFORMKIND> MLLRMEAN
<NUMXFORMS> 2
<LINXFORM> 1
<VECSIZE> 3
<OFFSET>
<BIAS> 3
 1.0 0.0 0.0
<BLOCKINFO> 1 3
<BLOCK> 1
<XFORM> 3 3
 2.0 0.0 0.0
 0.0 2.0 0.0
 0.0 0.0 2.0
<LINXFORM> 2
<VECSIZE> 3
<OFFSET>
<BIAS> 3
 0.0 -1.0 0.0
<BLOCKINFO> 1 3
<BLOCK> 1
<XFORM> 3 3
 1.0 0.0 0.0
 0.0 1.0 0.0
 0.0 0.0 1.0
<XFORMWGTSET>
<CLASSXFORM> 1 1
<CLASSXFORM> 2 2
"""


def models():
    return AcousticModelSet.from_def(parse_mmf(MMF, is_text=True))


class TestItemLists:
    def test_basic(self):
        items = parse_item_list("{aa.state[2-4].mix[1-2]}")
        assert len(items) == 1
        it = items[0]
        assert it.matches("aa", 2, 1)
        assert it.matches("aa", 4, 2)
        assert not it.matches("aa", 5, 1)
        assert not it.matches("aa", 2, 3)
        assert not it.matches("bb", 2, 1)

    def test_glob_and_groups(self):
        items = parse_item_list("{(a*,sil).state[2].mix[1]}, {*.state[3]}")
        assert items[0].matches("aa", 2, 1)
        assert items[0].matches("sil", 2, 1)
        assert not items[0].matches("bb", 2, 1)
        # no mix spec -> all mixes
        assert items[1].matches("anything", 3, 7)

    def test_index_lists(self):
        items = parse_item_list("{x.state[2,4-5].mix[1,3]}")
        it = items[0]
        assert it.matches("x", 2, 1) and it.matches("x", 5, 3)
        assert not it.matches("x", 3, 1)
        assert not it.matches("x", 2, 2)


class TestBaseClasses:
    def test_parse_and_lookup(self, tmp_path):
        p = tmp_path / "global.base"
        p.write_text(BASECLASS)
        bc = parse_baseclass(str(p))
        assert bc.name == "global"
        assert bc.num_classes == 2
        assert bc.class_of("aa", 2, 1) == 1
        assert bc.class_of("aa", 3, 2) == 1
        assert bc.class_of("bb", 2, 1) == 2
        assert bc.class_of("bb", 2, 2) == 0  # mix 2 not in any class
        assert bc.class_of("cc", 2, 1) == 0

    def test_component_classes(self, tmp_path):
        p = tmp_path / "global.base"
        p.write_text(BASECLASS)
        bc = parse_baseclass(str(p))
        ms = models()
        classes = component_classes(ms, bc)
        # aa: shared_s (states 2,4) + own state-3 GMM -> all class 1
        for s, gi in enumerate(ms.hmm_gmm_inds[ms.get_hmm_index("aa")]):
            assert (classes[int(gi)] == 1).all()
        # bb single-mixture states -> class 2
        for gi in ms.hmm_gmm_inds[ms.get_hmm_index("bb")]:
            np.testing.assert_array_equal(classes[int(gi)], [2])


class TestRegTree:
    def test_parse(self, tmp_path):
        p = tmp_path / "rtree"
        p.write_text(REGTREE)
        rt = parse_regtree(str(p))
        assert rt.name == "rtree"
        assert rt.baseclass_name == "global"
        assert rt.children[1] == [2, 3]
        assert sorted(rt.terminal_classes(1)) == [1, 2]
        assert rt.terminal_classes(3) == [2]


class TestXformSet:
    def test_parse(self, tmp_path):
        p = tmp_path / "spk.mllr"
        p.write_text(MLLR)
        xs = parse_xformset(str(p))
        assert xs.kind == "MLLRMEAN"
        assert xs.adapt_kind == "TREE"
        assert set(xs.xforms) == {1, 2}
        assert xs.class_to_xform == {1: 1, 2: 2}
        np.testing.assert_allclose(xs.xforms[1].A, 2.0 * np.eye(3))
        np.testing.assert_allclose(xs.xforms[2].b, [0.0, -1.0, 0.0])

    def test_apply_per_class(self, tmp_path):
        (tmp_path / "spk.mllr").write_text(MLLR)
        (tmp_path / "global.base").write_text(BASECLASS)
        xs = parse_xformset(str(tmp_path / "spk.mllr"))
        bc = parse_baseclass(str(tmp_path / "global.base"))
        ms = models()
        ad = apply_mllr_means(ms, xs, bc)
        # class 1 (all of aa): mu' = 2 mu + [1,0,0]
        gi = int(ms.hmm_gmm_inds[ms.get_hmm_index("aa")][1])
        np.testing.assert_allclose(
            ad.gmm_means[gi], 2.0 * ms.gmm_means[gi] + np.array([1.0, 0.0, 0.0])
        )
        # class 2 (bb): mu' = mu + [0,-1,0]
        gi = int(ms.hmm_gmm_inds[ms.get_hmm_index("bb")][0])
        np.testing.assert_allclose(
            ad.gmm_means[gi], ms.gmm_means[gi] + np.array([0.0, -1.0, 0.0])
        )
        # variances/weights untouched; original unmodified
        for a, b in zip(ad.gmm_vars, ms.gmm_vars):
            np.testing.assert_array_equal(a, b)
        assert not np.allclose(ad.gmm_means[gi], ms.gmm_means[gi])

    def test_single_class_matches_global_mean_transform(self, tmp_path):
        # a one-transform set with no weight table == with_mean_transform
        single = MLLR.split("<LINXFORM> 2")[0].replace("<NUMXFORMS> 2", "<NUMXFORMS> 1")
        p = tmp_path / "g.mllr"
        p.write_text(single)
        xs = parse_xformset(str(p))
        ms = models()
        a = apply_mllr_means(ms, xs, None)
        b = ms.with_mean_transform(xs.xforms[1].A, xs.xforms[1].b)
        for ma, mb in zip(a.gmm_means, b.gmm_means):
            np.testing.assert_allclose(ma, mb)

    def test_scoring_changes_consistently(self, tmp_path):
        (tmp_path / "spk.mllr").write_text(MLLR)
        (tmp_path / "global.base").write_text(BASECLASS)
        xs = parse_xformset(str(tmp_path / "spk.mllr"))
        bc = parse_baseclass(str(tmp_path / "global.base"))
        ms = models()
        ad = apply_mllr_means(ms, xs, bc)
        x = np.array([0.3, -0.2, 0.9])
        # scoring the adapted set at A x + b'ish points differs from original
        s0 = ms.score_all(x)
        s1 = ad.score_all(x)
        assert s0.shape == s1.shape
        assert not np.allclose(s0, s1)


class TestVarianceXforms:
    def test_mllr_var_per_class(self, tmp_path):
        """MLLRVAR: sigma'^2_d = sum_j H[d,j]^2 sigma^2_j per class."""
        from juicer_tpu.am.regtree import apply_mllr_var

        var_xf = MLLR.replace("MLLRMEAN", "MLLRVAR")
        (tmp_path / "spk.var").write_text(var_xf)
        (tmp_path / "global.base").write_text(BASECLASS)
        xs = parse_xformset(str(tmp_path / "spk.var"))
        bc = parse_baseclass(str(tmp_path / "global.base"))
        ms = models()
        ad = apply_mllr_var(ms, xs, bc)
        # class 1 (aa): H = 2I -> variances x4
        gi = int(ms.hmm_gmm_inds[ms.get_hmm_index("aa")][1])
        np.testing.assert_allclose(ad.gmm_vars[gi], 4.0 * ms.gmm_vars[gi])
        # class 2 (bb): H = I -> unchanged
        gi = int(ms.hmm_gmm_inds[ms.get_hmm_index("bb")][0])
        np.testing.assert_allclose(ad.gmm_vars[gi], ms.gmm_vars[gi])
        # means untouched
        for a, b in zip(ad.gmm_means, ms.gmm_means):
            np.testing.assert_array_equal(a, b)

    def test_mllr_cov_global_exact(self, tmp_path):
        """Global MLLRCOV: scoring the returned (models', feature xform)
        pair equals the full-covariance Gaussian N(x; mu, H Sigma H^T)
        evaluated directly."""
        from juicer_tpu.am.regtree import apply_mllr_cov

        # a global non-diagonal H (rotation-ish + scale)
        cov = """~a "spk.cov"
<ADAPTKIND> BASE
<XFORMSET>
<XFORMKIND> MLLRCOV
<NUMXFORMS> 1
<LINXFORM> 1
<VECSIZE> 3
<BLOCKINFO> 1 3
<BLOCK> 1
<XFORM> 3 3
 1.2 0.3 0.0
 -0.2 1.1 0.1
 0.0 0.2 0.9
"""
        p = tmp_path / "spk.cov"
        p.write_text(cov)
        xs = parse_xformset(str(p))
        assert xs.kind == "MLLRCOV"
        ms = models()
        ad, feat = apply_mllr_cov(ms, xs)
        H = xs.xforms[1].A
        rng = np.random.default_rng(0)
        for _ in range(3):
            x = rng.normal(size=3)
            # direct full-covariance evaluation per GMM
            for gi in range(ms.n_gmms):
                direct = -np.inf
                for c in range(ms.gmm_means[gi].shape[0]):
                    mu = ms.gmm_means[gi][c]
                    S = H @ np.diag(ms.gmm_vars[gi][c]) @ H.T
                    d = x - mu
                    ll = (
                        -0.5 * d @ np.linalg.solve(S, d)
                        - 0.5 * (len(x) * np.log(2 * np.pi)
                                 + np.linalg.slogdet(S)[1])
                        + ms.gmm_log_weights[gi][c]
                    )
                    direct = np.logaddexp(direct, ll)
                got = ad.score_gmm(gi, feat.A @ x + feat.b)
                assert abs(got - direct) < 1e-9, (gi, got, direct)

    def test_mllr_cov_multiclass_rejected(self, tmp_path):
        from juicer_tpu.am.regtree import apply_mllr_cov
        import pytest

        (tmp_path / "spk.cov").write_text(MLLR.replace("MLLRMEAN", "MLLRCOV"))
        xs = parse_xformset(str(tmp_path / "spk.cov"))
        with pytest.raises(NotImplementedError):
            apply_mllr_cov(models(), xs)


class TestCliFlag:
    def test_load_models_adapts(self, tmp_path):
        from juicer_tpu.cli.juicer import load_models, make_parser

        mmf = tmp_path / "models.mmf"
        mmf.write_text(MMF)
        (tmp_path / "spk.mllr").write_text(MLLR)
        (tmp_path / "global.base").write_text(BASECLASS)
        args = make_parser().parse_args(
            [
                "-lexFName", "x", "-fsmFName", "x",
                "-inSymsFName", "x", "-outSymsFName", "x",
                "-htkModelsFName", str(mmf),
                "-mllrXformFile", str(tmp_path / "spk.mllr"),
                "-regClassFile", str(tmp_path / "global.base"),
            ]
        )
        ad = load_models(args)
        plain = AcousticModelSet.from_mmf(str(mmf))
        gi = int(plain.hmm_gmm_inds[plain.get_hmm_index("bb")][0])
        np.testing.assert_allclose(
            ad.gmm_means[gi], plain.gmm_means[gi] + np.array([0.0, -1.0, 0.0])
        )
