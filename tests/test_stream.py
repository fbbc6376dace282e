"""Streaming (partial decoding) tests."""

import numpy as np
import pytest

import jax

from juicer_tpu.fst import Fst, LOG
from juicer_tpu.decoder import DecoderNetwork, TpuDecoder
from juicer_tpu.decoder.artifact import DecoderArtifact
from juicer_tpu.decoder.tpu_core import TpuDecoderConfig

from test_decoder import make_models, scores_matrix


@pytest.fixture(scope="module", autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def make_decoder(fst, models):
    net = DecoderNetwork(fst)
    art = DecoderArtifact(net, models)
    return TpuDecoder(
        art,
        TpuDecoderConfig(max_insts=64, expand_budget=256, final_budget=64,
                         dtype="float64"),
    )


class TestStreaming:
    def test_stream_matches_batch(self):
        models = make_models(6)
        f = Fst(LOG)
        s = f.add_state()
        f.set_start(s)
        hmm = 0
        for w in range(3):
            for p in range(2):
                t = f.add_state()
                ol = (w + 1) if p == 1 else 0
                f.add_arc(s, t, hmm + 1, ol, 0.1 * (w + p))
                s = t
                hmm += 1
        f.set_final(s, 0.05)
        dec = make_decoder(f, models)
        sc = scores_matrix(models, 20, seed=1)

        batch = dec.decode_scores(sc)
        stream = dec.stream()
        partials = []
        for chunk in (sc[:7], sc[7:13], sc[13:]):
            partials.extend(stream.feed(chunk))
        final = stream.finish()

        assert final.words == batch.words == [1, 2, 3]
        assert abs(final.score - batch.score) < 1e-9
        assert abs(final.acoustic_score - batch.acoustic_score) < 1e-9
        # every emitted partial word must be a prefix of the final result
        pwords = [h.word for h in partials]
        assert pwords == batch.words[: len(pwords)]

    def test_partials_emitted_before_finish(self):
        # long utterance through a loop: some words should converge early
        models = make_models(4, seed=13)
        f = Fst(LOG)
        s0 = f.add_state()
        f.set_start(s0)
        for w in range(4):
            f.add_arc(s0, s0, w + 1, w + 1, 0.5)
        f.set_final(s0, 0.0)
        dec = make_decoder(f, models)
        sc = scores_matrix(models, 60, seed=17)
        batch = dec.decode_scores(sc)

        stream = dec.stream()
        partial_counts = []
        n = 0
        for i in range(0, 60, 10):
            got = stream.feed(sc[i : i + 10])
            n += len(got)
            partial_counts.append(n)
        final = stream.finish()
        assert final.words == batch.words
        # at least some words converged before the end of the stream
        assert partial_counts[-2] > 0
        # partial stream was monotone and a prefix of the final
        assert n <= len(final.words)
