"""Front-end (wav -> MFCC) tests."""

import wave

import numpy as np
import pytest

from juicer_tpu.harness.frontend import (
    FrontendConfig, mel_filterbank, mfcc, read_wav, wav_to_features,
)


def write_wav(path, x, rate=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.clip(x, -32768, 32767).astype("<i2").tobytes())


class TestFrontend:
    def test_shapes(self):
        x = np.random.default_rng(0).normal(scale=1000, size=16000)  # 1s
        f = mfcc(x)
        # 10ms shift, 25ms window: (16000-400)//160 + 1 = 98 frames
        assert f.shape == (98, 39)
        f2 = mfcc(x, FrontendConfig(deltas=False))
        assert f2.shape == (98, 13)

    def test_cmn_zero_mean(self):
        x = np.random.default_rng(1).normal(scale=500, size=8000)
        f = mfcc(x)
        np.testing.assert_allclose(f.mean(axis=0), 0.0, atol=1e-4)

    def test_tone_peaks_in_right_mel_band(self):
        # a pure 1 kHz tone should put its energy in the matching filterbank
        rate = 16000
        t = np.arange(rate) / rate
        x = 10000 * np.sin(2 * np.pi * 1000 * t)
        cfg = FrontendConfig(deltas=False, cmn=False)
        flen, n_fft = 400, 512
        fb = mel_filterbank(cfg.n_mels, n_fft, rate, 0, 0)
        frames = x[:flen] * np.hamming(flen)
        spec = np.abs(np.fft.rfft(frames, n_fft)) ** 2
        mel_e = spec @ fb.T
        peak_band = int(np.argmax(mel_e))
        # 1 kHz -> mel ~1000; band centers spread 0..mel(8000)=2840 over 26
        # bands -> expect peak around band 8-10
        assert 6 <= peak_band <= 12

    def test_wav_roundtrip_and_factory(self, tmp_path):
        rng = np.random.default_rng(2)
        x = rng.normal(scale=3000, size=12000)
        p = tmp_path / "a.wav"
        write_wav(p, x)
        y, rate = read_wav(str(p))
        assert rate == 16000
        assert len(y) == 12000
        f = wav_to_features(str(p))
        assert f.shape[1] == 39
        assert np.isfinite(f).all()

    def test_silence_stable(self):
        f = mfcc(np.zeros(8000), FrontendConfig(cmn=False))
        assert np.isfinite(f).all()
