"""Pallas GMM kernel tests (interpreter mode on CPU)."""

import numpy as np
import pytest

from juicer_tpu.ops.gmm import make_gmm_scorer
from juicer_tpu.ops.gmm_pallas import make_pallas_gmm_scorer

from test_decoder import make_models


class TestPallasGmm:
    def test_matches_oracle(self):
        models = make_models(10, n_emit=3, dim=13, n_comps=5, seed=0)
        params = models.flat_params()
        scorer = make_pallas_gmm_scorer(params, interpret=True)
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(37, 13)).astype(np.float32)
        got = np.asarray(scorer(feats))
        ref = np.stack([models.score_all(f.astype(np.float64)) for f in feats])
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)

    def test_matches_dense(self):
        models = make_models(7, n_emit=2, dim=8, n_comps=3, seed=3)
        params = models.flat_params()
        pal = make_pallas_gmm_scorer(params, interpret=True)
        dense = make_gmm_scorer(params, use_pallas="never")
        rng = np.random.default_rng(1)
        feats = rng.normal(size=(130, 8)).astype(np.float32)  # crosses Tb=128
        np.testing.assert_allclose(
            np.asarray(pal(feats)), np.asarray(dense(feats)), atol=1e-3
        )

    def test_single_frame_and_padding(self):
        models = make_models(3, n_emit=1, dim=4, n_comps=2, seed=5)
        params = models.flat_params()
        pal = make_pallas_gmm_scorer(params, interpret=True)
        feats = np.zeros((1, 4), np.float32)
        out = np.asarray(pal(feats))
        assert out.shape == (1, params.n_gmms)
        ref = models.score_all(np.zeros(4))
        np.testing.assert_allclose(out[0], ref, atol=1e-3)
