"""Multi-device (virtual 8-CPU mesh) and driver entry-point tests."""

import numpy as np
import pytest

import jax

from juicer_tpu.parallel import BatchDecoder, make_mesh
from juicer_tpu.decoder import DecoderNetwork, TpuDecoder
from juicer_tpu.decoder.artifact import DecoderArtifact
from juicer_tpu.decoder.tpu_core import TpuDecoderConfig
from juicer_tpu.fst import Fst, LOG

from test_decoder import make_models, scores_matrix


def make_task():
    models = make_models(6, seed=3)
    f = Fst(LOG)
    s0 = f.add_state()
    f.set_start(s0)
    for w in range(6):
        f.add_arc(s0, s0, w + 1, w + 1, 0.4)
    f.set_final(s0, 0.0)
    net = DecoderNetwork(f)
    art = DecoderArtifact(net, models)
    dec = TpuDecoder(art, TpuDecoderConfig(max_insts=64, expand_budget=256,
                                           final_budget=64))
    return models, dec


class TestBatchDecoder:
    def test_mesh_has_8_devices(self):
        assert len(jax.devices()) == 8  # conftest forces the virtual mesh

    def test_sharded_batch_matches_single(self):
        models, dec = make_task()
        B, T = 8, 12
        scores = np.stack([scores_matrix(models, T, seed=s) for s in range(B)])
        mesh = make_mesh()
        bd = BatchDecoder(dec, mesh)
        results = bd.decode_scores_batch(scores)
        assert len(results) == B
        for b in range(B):
            single = dec.decode_scores(scores[b])
            assert results[b].words == single.words
            assert abs(results[b].score - single.score) < 1e-4

    def test_unsharded_batch(self):
        models, dec = make_task()
        scores = np.stack([scores_matrix(models, 10, seed=s) for s in range(3)])
        bd = BatchDecoder(dec, mesh=None)
        results = bd.decode_scores_batch(scores)
        assert len(results) == 3
        assert all(not r.empty for r in results)

    def test_padded_batch_exact_per_length(self):
        """Utterances of different lengths padded to a common T decode
        exactly like individual decodes (per-frame best-final snapshot)."""
        models, dec = make_task()
        lengths = [7, 12, 18]
        singles = []
        scores = []
        for i, L in enumerate(lengths):
            s = scores_matrix(models, L, seed=10 + i)
            singles.append(dec.decode_scores(s))
            scores.append(s)
        t_max = max(lengths)
        padded = np.stack(
            [np.pad(s, ((0, t_max - s.shape[0]), (0, 0)), mode="edge") for s in scores]
        )
        bd = BatchDecoder(dec, mesh=None)
        results = bd.decode_scores_batch(padded, lengths)
        for r, s in zip(results, singles):
            assert r.words == s.words
            assert abs(r.score - s.score) < 1e-4
            assert r.n_frames == s.n_frames
            assert [h.end_frame for h in r.word_hyps] == [
                h.end_frame for h in s.word_hyps
            ]


class TestMultiProcess:
    def test_two_process_distributed_decode(self):
        """jax.distributed 2-process corpus-sharded decode with collective
        statistics aggregation (the multi-host code path on CPU)."""
        import os
        import subprocess
        import sys

        script = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "multihost_demo.py",
        )
        out = subprocess.run(
            [sys.executable, script, "2"], capture_output=True, text=True,
            timeout=300,
        )
        assert "MULTIHOST OK: 2 processes, 8 utterances" in out.stdout, out.stderr[-2000:]


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys, os

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(float(out)) or float(out) < -1e29

    def test_dryrun_multichip(self):
        import sys, os

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
