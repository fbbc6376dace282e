"""Parity of the fused Pallas decode scan vs the XLA scan (tpu_core).

The kernel (decoder/pallas_scan.py) re-implements the frame step op-for-op;
these tests assert the traceback records, best-final snapshots, diagnostics
and the final DecodeResult agree with the XLA path in float32 (interpret
mode on CPU; the same class compiles unchanged on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from juicer_tpu.utils.synth import make_synth_task
from juicer_tpu.decoder.tpu_core import TpuDecoder, TpuDecoderConfig
from juicer_tpu.decoder.pallas_scan import (
    PallasDecodeScan, assemble_results, pallas_eligible,
)
from juicer_tpu.ops.gmm import make_gmm_scorer

B, T = 8, 128


def _mk(beams=True, seed=0):
    task = make_synth_task(n_words=12, n_phones=8, vec_size=8, n_comps=2,
                           seed=seed)
    kw = dict(emit_prune_win=150.0, phone_end_prune_win=75.0) if beams else {}
    cfg = TpuDecoderConfig(max_insts=128, expand_budget=256, final_budget=128,
                           emit_diagnostics=True, **kw)
    dec = TpuDecoder(task.artifact, cfg)
    scorer = make_gmm_scorer(task.models.flat_params())
    return task, dec, scorer


def _batch_scores(task, scorer, seed):
    rng = np.random.default_rng(seed)
    utts, lens = [], []
    scores_tbg = None
    for i in range(B):
        f = task.synth_utterance([f"w{(2 * i) % 12}", f"w{(i + 1) % 12}"], rng)
        s = np.asarray(scorer(jnp.asarray(f, jnp.float32)))[:T]
        if scores_tbg is None:
            scores_tbg = np.zeros((T, B, s.shape[-1]), np.float32)
        L = s.shape[0]
        scores_tbg[:L, i] = s
        scores_tbg[L:, i] = s[-1]
        utts.append(s)
        lens.append(L)
    return scores_tbg, utts, lens


@pytest.mark.parametrize("beams", [True, False])
def test_pallas_scan_matches_xla(beams):
    task, dec, scorer = _mk(beams=beams)
    assert pallas_eligible(dec)
    scores_tbg, _, _ = _batch_scores(task, scorer, seed=3)

    ps = PallasDecodeScan(dec, B=B, chunk=64, interpret=True)
    carry_p, ys_p = ps(jnp.asarray(scores_tbg))

    def one(s):
        carry, ys, rec0 = dec._decode_scan(s.astype(dec._dt))
        return carry, ys

    carry_x, ys_x = jax.vmap(one, in_axes=1)(jnp.asarray(scores_tbg))

    for k in ["rec_prev", "rec_seq", "rec_score", "rec_ac", "rec_lm"]:
        np.testing.assert_array_equal(
            np.asarray(ys_p[k]), np.asarray(ys_x[k]).transpose(1, 0, 2),
            err_msg=k,
        )
    for k in ["bf_score", "bf_ac", "bf_lm", "bf_path", "bf_seq",
              "n_active", "n_cand"]:
        np.testing.assert_array_equal(
            np.asarray(ys_p[k]), np.asarray(ys_x[k]).transpose(1, 0),
            err_msg=k,
        )
    np.testing.assert_array_equal(
        np.asarray(carry_p["ovf"])[:, 0] > 0.5,
        np.asarray(carry_x["overflow"]),
    )
    np.testing.assert_array_equal(
        np.asarray(carry_p["norm"])[:, 0], np.asarray(carry_x["norm"])
    )


def test_pallas_results_match_decode_scores():
    """End-to-end: DecodeResults assembled from the Pallas ys equal the XLA
    decode_scores output (words, scores, word boundary frames)."""
    task, dec, scorer = _mk(beams=True, seed=1)
    scores_tbg, utts, lens = _batch_scores(task, scorer, seed=5)

    ps = PallasDecodeScan(dec, B=B, chunk=64, interpret=True)
    carry_p, ys_p = ps(jnp.asarray(scores_tbg))
    results = assemble_results(dec, ps, carry_p, ys_p, lens)
    for i in range(B):
        ref = dec.decode_scores(utts[i])
        got = results[i]
        assert got.words == ref.words, i
        assert got.score == pytest.approx(ref.score, abs=1e-4)
        assert got.acoustic_score == pytest.approx(ref.acoustic_score, abs=1e-4)
        assert [h.end_frame for h in got.word_hyps] == [
            h.end_frame for h in ref.word_hyps
        ]
        assert got.words  # non-degenerate


class TestBatchDecoderPallasRoute:
    """BatchDecoder routes through the fused kernel (use_pallas)."""

    def _batch(self, seed):
        task, dec, scorer = _mk(beams=True, seed=seed)
        scores_tbg, utts, lens = _batch_scores(task, scorer, seed=seed + 10)
        scores_btg = np.transpose(scores_tbg, (1, 0, 2))
        return dec, scores_btg, utts, lens

    def test_single_device(self):
        from juicer_tpu.parallel import BatchDecoder

        dec, scores_btg, utts, lens = self._batch(2)
        bd = BatchDecoder(dec, mesh=None, use_pallas=True, pallas_chunk=64,
                          pallas_interpret=True)
        results = bd.decode_scores_batch(scores_btg, lengths=lens)
        assert (8 in bd._ps)  # the Pallas path actually ran
        for i, r in enumerate(results):
            ref = dec.decode_scores(utts[i])
            assert r.words == ref.words, i
            assert r.score == pytest.approx(ref.score, abs=1e-4)

    def test_sharded_mesh(self):
        from juicer_tpu.parallel import BatchDecoder, make_mesh

        dec, scores_btg, utts, lens = self._batch(4)
        mesh = make_mesh(2)  # B=8 -> B_local=4? no: B_local must be %8
        # duplicate the batch to 16 so each of 2 shards holds 8 utterances
        scores_btg = np.concatenate([scores_btg, scores_btg], axis=0)
        lens = lens + lens
        bd = BatchDecoder(dec, mesh=mesh, use_pallas=True, pallas_chunk=64,
                          pallas_interpret=True)
        results = bd.decode_scores_batch(scores_btg, lengths=lens)
        assert (8 in bd._ps)
        for i, r in enumerate(results):
            ref = dec.decode_scores(utts[i % 8])
            assert r.words == ref.words, i
            assert r.score == pytest.approx(ref.score, abs=1e-4)

    def test_auto_falls_back(self):
        """An ineligible batch size silently falls back to the XLA vmap."""
        from juicer_tpu.parallel import BatchDecoder

        dec, scores_btg, utts, lens = self._batch(6)
        bd = BatchDecoder(dec, mesh=None, use_pallas="auto",
                          pallas_interpret=True)
        results = bd.decode_scores_batch(scores_btg[:3], lengths=lens[:3])
        assert not bd._ps  # XLA path
        for i, r in enumerate(results):
            ref = dec.decode_scores(utts[i])
            assert r.words == ref.words, i
