"""Acoustic feature front end: waveform -> MFCC(+deltas)(+CMN).

Replaces the reference's Tracter `ASRFactory` capture/feature chain
(`/root/reference/src/FrontEnd.h:24-135`) for the common MFCC case, in
HTK's conventions:

  - pre-emphasis (0.97), 25 ms frames at 10 ms shift, Hamming window;
  - HTK mel scale (2595 log10(1 + f/700)), triangular filterbank, log;
  - DCT-II cepstra with HTK liftering (CEPLIFTER 22), C0 or log-energy;
  - delta/delta-delta by HTK's regression formula (window 2);
  - optional per-utterance cepstral mean normalization (the _Z qualifier).

This is numerically HTK-*like*, not bit-identical to any particular HCopy
build; models trained elsewhere should be used with features from their
own front end (the harness reads HTK/LNA files for that).
"""

from __future__ import annotations

import wave
from dataclasses import dataclass

import numpy as np


@dataclass
class FrontendConfig:
    sample_rate: int = 16000
    frame_len_ms: float = 25.0
    frame_shift_ms: float = 10.0
    preemphasis: float = 0.97
    n_mels: int = 26
    n_ceps: int = 12
    ceplifter: int = 22
    low_freq: float = 0.0
    high_freq: float = 0.0  # 0 -> Nyquist
    use_energy: bool = False  # False -> C0
    deltas: bool = True
    delta_window: int = 2
    cmn: bool = True


def read_wav(path: str) -> tuple[np.ndarray, int]:
    with wave.open(path, "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        data = w.readframes(n)
    if width == 2:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64)
    elif width == 1:
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
    elif width == 4:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64)
    else:
        raise ValueError(f"unsupported wav sample width {width}")
    return x, rate


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def mel_filterbank(n_mels, n_fft, rate, low, high):
    high = high or rate / 2.0
    pts = _mel_to_hz(np.linspace(_hz_to_mel(low), _hz_to_mel(high), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(n_mels):
        a, b, c = bins[m], bins[m + 1], bins[m + 2]
        for k in range(a, b):
            if b > a:
                fb[m, k] = (k - a) / (b - a)
        for k in range(b, c):
            if c > b:
                fb[m, k] = (c - k) / (c - b)
    return fb


def _deltas(x: np.ndarray, window: int) -> np.ndarray:
    T = x.shape[0]
    denom = 2.0 * sum(t * t for t in range(1, window + 1))
    pad = np.pad(x, ((window, window), (0, 0)), mode="edge")
    out = np.zeros_like(x)
    for t in range(1, window + 1):
        out += t * (pad[window + t : window + t + T] - pad[window - t : window - t + T])
    return out / denom


def mfcc(signal: np.ndarray, cfg: FrontendConfig = FrontendConfig()) -> np.ndarray:
    """Waveform (float samples) -> (T, D) features."""
    x = np.asarray(signal, dtype=np.float64)
    flen = int(round(cfg.sample_rate * cfg.frame_len_ms / 1000.0))
    shift = int(round(cfg.sample_rate * cfg.frame_shift_ms / 1000.0))
    if len(x) < flen:
        x = np.pad(x, (0, flen - len(x)))
    n_frames = 1 + (len(x) - flen) // shift
    idx = np.arange(flen)[None, :] + shift * np.arange(n_frames)[:, None]
    frames = x[idx].copy()
    # log energy before windowing (HTK)
    energy = np.log(np.maximum(np.sum(frames * frames, axis=1), 1e-10))
    frames[:, 1:] -= cfg.preemphasis * frames[:, :-1]
    frames[:, 0] *= 1.0 - cfg.preemphasis
    frames *= np.hamming(flen)[None, :]
    n_fft = 1 << (flen - 1).bit_length()
    spec = np.abs(np.fft.rfft(frames, n_fft)) ** 2
    fb = mel_filterbank(cfg.n_mels, n_fft, cfg.sample_rate, cfg.low_freq, cfg.high_freq)
    logmel = np.log(np.maximum(spec @ fb.T, 1e-10))
    # DCT-II, HTK normalization
    n = cfg.n_mels
    dct = np.cos(np.pi * np.arange(cfg.n_ceps + 1)[:, None] * (np.arange(n)[None, :] + 0.5) / n)
    dct *= np.sqrt(2.0 / n)
    ceps = logmel @ dct.T  # (T, n_ceps+1): row 0 is C0
    if cfg.ceplifter > 0:
        L = cfg.ceplifter
        lift = 1.0 + (L / 2.0) * np.sin(np.pi * np.arange(cfg.n_ceps + 1) / L)
        ceps *= lift[None, :]
    c = ceps[:, 1:]
    c0 = energy if cfg.use_energy else ceps[:, 0]
    static = np.concatenate([c, c0[:, None]], axis=1)  # HTK order: c1..cN, c0/E
    feats = static
    if cfg.deltas:
        d1 = _deltas(static, cfg.delta_window)
        d2 = _deltas(d1, cfg.delta_window)
        feats = np.concatenate([static, d1, d2], axis=1)
    if cfg.cmn:
        feats = feats - feats.mean(axis=0, keepdims=True)
    return feats.astype(np.float32)


def wav_to_features(path: str, cfg: FrontendConfig = FrontendConfig()) -> np.ndarray:
    x, rate = read_wav(path)
    if rate != cfg.sample_rate:
        from dataclasses import replace

        cfg = replace(cfg, sample_rate=rate)
    return mfcc(x, cfg)
