"""Live-capture front end tests (harness/capture.py)."""

import io
import shutil

import numpy as np
import pytest

from juicer_tpu.harness.capture import PcmSource, StreamingFrontend, capture_features
from juicer_tpu.harness.frontend import FrontendConfig, mfcc


def signal(n=8000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (
        3000 * np.sin(2 * np.pi * 440 * t / 16000)
        + 500 * rng.normal(size=n)
    )


CFG = FrontendConfig(cmn=False)


class TestStreamingFrontend:
    def test_single_shot_matches_batch(self):
        x = signal()
        fe = StreamingFrontend(CFG)
        out = np.concatenate([fe.feed(x), fe.flush()])
        ref = mfcc(x, CFG)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)

    def test_chunked_matches_batch_exactly(self):
        x = signal(12000)
        fe = StreamingFrontend(CFG)
        chunks = []
        # ragged chunk sizes incl. sub-frame-length pieces
        for piece in np.split(x, [130, 131, 1000, 1700, 4096, 9000]):
            chunks.append(fe.feed(piece))
        chunks.append(fe.flush())
        out = np.concatenate(chunks)
        ref = mfcc(x, CFG)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)

    def test_no_deltas(self):
        cfg = FrontendConfig(cmn=False, deltas=False)
        x = signal()
        fe = StreamingFrontend(cfg)
        out = np.concatenate([fe.feed(x), fe.flush()])
        ref = mfcc(x, cfg)
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)
        assert fe.dim == cfg.n_ceps + 1

    def test_running_cmn(self):
        cfg = FrontendConfig(cmn=True)
        x = signal()
        fe = StreamingFrontend(cfg)
        raw_fe = StreamingFrontend(CFG)
        out = np.concatenate([fe.feed(x), fe.flush()])
        raw = np.concatenate([raw_fe.feed(x), raw_fe.flush()])
        # frame t is normalized by the mean of everything emitted through
        # its own emission batch (causal running CMN)
        np.testing.assert_allclose(out[-1], raw[-1] - raw.mean(axis=0), atol=1e-4)
        # a live source cannot match batch CMN exactly, but it should be close
        batch = mfcc(x, cfg)
        assert np.abs(out[-1] - batch[-1]).max() < 1.0

    def test_tiny_stream_pads_one_frame(self):
        fe = StreamingFrontend(CFG)
        out = np.concatenate([fe.feed(signal(100)), fe.flush()])
        assert out.shape == (1, fe.dim)


class TestPcmSource:
    def test_stream_roundtrip(self):
        x = (1000 * np.sin(np.arange(500))).astype("<i2")
        src = PcmSource(stream=io.BytesIO(x.tobytes()))
        got = np.concatenate([src.read(123) for _ in range(6)])
        np.testing.assert_array_equal(got, x.astype(np.float64))
        assert src.read(10).size == 0

    def test_torn_final_sample(self):
        src = PcmSource(stream=io.BytesIO(b"\x01\x00\x02"))
        got = src.read(10)
        assert got.tolist() == [1.0]

    def test_arg_validation(self):
        with pytest.raises(ValueError):
            PcmSource()
        with pytest.raises(ValueError):
            PcmSource(device="hw:0", stream=io.BytesIO())

    @pytest.mark.skipif(shutil.which("arecord") is not None,
                        reason="arecord exists here; gating not exercised")
    def test_device_without_arecord(self):
        with pytest.raises(RuntimeError, match="arecord"):
            PcmSource(device="hw:0")


class TestCaptureFeatures:
    def test_end_to_end(self):
        x = signal(6000)
        pcm = np.clip(x, -32768, 32767).astype("<i2")
        src = PcmSource(stream=io.BytesIO(pcm.tobytes()))
        chunks = list(capture_features(src, CFG, chunk_samples=777))
        out = np.concatenate(chunks)
        ref = mfcc(pcm.astype(np.float64), CFG)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)


class TestCliLoopCapture:
    def test_run_loop_audio_stdin(self, monkeypatch, capsys):
        """-loop -audioDevice -: raw PCM on stdin drives the live front end
        and the decoder stream (plumbing test with a recording fake)."""
        import argparse
        import sys

        from juicer_tpu.cli.juicer import run_loop

        x = signal(6000)
        pcm = np.clip(x, -32768, 32767).astype("<i2")
        expected = mfcc(pcm.astype(np.float64), FrontendConfig())  # cmn on: dim 39

        seen = []

        class FakeStream:
            def feed(self, sc):
                seen.append(np.asarray(sc))
                return []

            def finish(self):
                class R:
                    words = [1]

                return R()

        class FakeDec:
            def stream(self):
                return FakeStream()

        class FakeModels:
            vec_size = expected.shape[1]
            hybrid_mode = False

        class Stdin:
            buffer = io.BytesIO(pcm.tobytes())

        monkeypatch.setattr(sys, "stdin", Stdin())
        args = argparse.Namespace(
            audioDevice="-", audioSampleRate=16000, loopChunk=5
        )
        rc = run_loop(args, FakeDec(), lambda f: f, FakeModels(), ["hello"])
        assert rc == 0
        got = np.concatenate(seen)
        assert got.shape == expected.shape
        assert "final: hello" in capsys.readouterr().out
