"""Live audio capture: PCM source -> streaming MFCC front end.

Rebuild of the Tracter `ASRFactory` capture chain the reference selects
for its `-loop` endless-microphone mode (`FrontEnd.h:24-135`,
`DecoderBatchTest.cpp` loop path): an audio *source* (ALSA device or
file/pipe) feeding the feature chain incrementally, so the decoder can
consume features while audio is still arriving.

Two pieces:

- `PcmSource`: pulls raw signed-16-bit little-endian mono PCM either
  from an ALSA capture device (via an `arecord` subprocess — the
  environment-portable equivalent of Tracter's ALSASource; gated on the
  binary existing) or from any binary file object (stdin, a pipe, a
  file), which is how tests and headless machines drive it.

- `StreamingFrontend`: the incremental version of `frontend.mfcc` —
  identical filterbank/DCT/liftering math, but framed over a rolling
  sample buffer, deltas computed with the exact HTK regression window
  using bounded lookahead, and *running* cepstral mean normalization
  (a live source cannot see the future; batch CMN stays available for
  file decoding). Feeding the whole signal at once and flushing yields
  the same frame count as the batch `mfcc`.
"""

from __future__ import annotations

import subprocess
from dataclasses import replace
from typing import BinaryIO, Iterator, Optional

import numpy as np

from .frontend import FrontendConfig, mel_filterbank


class PcmSource:
    """Raw S16LE mono PCM from an ALSA device or a binary stream."""

    def __init__(
        self,
        device: Optional[str] = None,
        stream: Optional[BinaryIO] = None,
        sample_rate: int = 16000,
    ):
        if (device is None) == (stream is None):
            raise ValueError("give exactly one of device= or stream=")
        self.sample_rate = sample_rate
        self._proc: Optional[subprocess.Popen] = None
        if device is not None:
            try:
                self._proc = subprocess.Popen(
                    [
                        "arecord", "-q", "-t", "raw", "-f", "S16_LE",
                        "-c", "1", "-r", str(sample_rate), "-D", device,
                    ],
                    stdout=subprocess.PIPE,
                )
            except FileNotFoundError as e:
                raise RuntimeError(
                    "audio capture needs the `arecord` binary (alsa-utils); "
                    "pipe raw S16LE PCM into stdin instead"
                ) from e
            self._stream = self._proc.stdout
        else:
            self._stream = stream

    def read(self, n_samples: int) -> np.ndarray:
        """Up to n_samples as float64; empty array at end of stream."""
        data = self._stream.read(2 * n_samples)
        if not data:
            return np.empty(0)
        if len(data) % 2:  # torn final sample at EOF
            data = data[:-1]
        return np.frombuffer(data, dtype="<i2").astype(np.float64)

    def close(self) -> None:
        if self._proc is not None:
            self._proc.terminate()
            self._proc.wait()


class StreamingFrontend:
    """Incremental waveform -> MFCC(+deltas, running CMN).

    feed(samples) -> (n, D) array of newly completed feature frames (may
    be empty); flush() -> the trailing frames held back for delta
    lookahead. Static cepstra match `frontend.mfcc` exactly; deltas match
    away from utterance edges (the batch version edge-pads the whole
    utterance, a stream edge-pads only its start/end).
    """

    def __init__(self, cfg: FrontendConfig = FrontendConfig()):
        self.cfg = cfg
        self.flen = int(round(cfg.sample_rate * cfg.frame_len_ms / 1000.0))
        self.shift = int(round(cfg.sample_rate * cfg.frame_shift_ms / 1000.0))
        self.n_fft = 1 << (self.flen - 1).bit_length()
        self._fb = mel_filterbank(
            cfg.n_mels, self.n_fft, cfg.sample_rate, cfg.low_freq, cfg.high_freq
        )
        n = cfg.n_mels
        dct = np.cos(
            np.pi * np.arange(cfg.n_ceps + 1)[:, None] * (np.arange(n)[None, :] + 0.5) / n
        ) * np.sqrt(2.0 / n)
        self._dct = dct
        if cfg.ceplifter > 0:
            L = cfg.ceplifter
            self._lift = 1.0 + (L / 2.0) * np.sin(np.pi * np.arange(cfg.n_ceps + 1) / L)
        else:
            self._lift = np.ones(cfg.n_ceps + 1)
        self._samples = np.empty(0)
        # delta-delta at frame t needs statics in [t-2w, t+2w]: hold back a
        # 2w-frame lookahead tail, keep a 2w-frame history of emitted statics
        self._look = 2 * cfg.delta_window if cfg.deltas else 0
        self._pending = np.empty((0, cfg.n_ceps + 1))
        self._hist = np.empty((0, cfg.n_ceps + 1))
        self._cmn_sum: Optional[np.ndarray] = None
        self._cmn_n = 0
        self._started = False  # any static frame extracted yet

    @property
    def dim(self) -> int:
        d = self.cfg.n_ceps + 1
        return 3 * d if self.cfg.deltas else d

    def _statics(self, frames: np.ndarray) -> np.ndarray:
        energy = np.log(np.maximum(np.sum(frames * frames, axis=1), 1e-10))
        frames = frames.copy()
        frames[:, 1:] -= self.cfg.preemphasis * frames[:, :-1]
        frames[:, 0] *= 1.0 - self.cfg.preemphasis
        frames *= np.hamming(self.flen)[None, :]
        spec = np.abs(np.fft.rfft(frames, self.n_fft)) ** 2
        logmel = np.log(np.maximum(spec @ self._fb.T, 1e-10))
        ceps = (logmel @ self._dct.T) * self._lift[None, :]
        c0 = energy if self.cfg.use_energy else ceps[:, 0]
        return np.concatenate([ceps[:, 1:], c0[:, None]], axis=1)

    def _emit(self, final: bool) -> np.ndarray:
        """Frames of self._pending whose delta windows are now complete."""
        cfg = self.cfg
        avail = self._pending.shape[0]
        n_out = avail if final else max(0, avail - self._look)
        if n_out == 0:
            return np.empty((0, self.dim), dtype=np.float32)
        if cfg.deltas:
            w = cfg.delta_window
            # index clipping in reg() edge-pads: at the true stream start
            # (hist shorter than 2w) and, when final, at the stream end —
            # matching the batch version's utterance-edge padding. For
            # interior frames the window is always fully inside ctx.
            ctx = np.concatenate([self._hist, self._pending])
            start = self._hist.shape[0]

            def reg(x):
                denom = 2.0 * sum(t * t for t in range(1, w + 1))
                out = np.zeros_like(x)
                for t in range(1, w + 1):
                    lo = np.clip(np.arange(x.shape[0]) - t, 0, x.shape[0] - 1)
                    hi = np.clip(np.arange(x.shape[0]) + t, 0, x.shape[0] - 1)
                    out += t * (x[hi] - x[lo])
                return out / denom

            d1 = reg(ctx)
            d2 = reg(d1)
            sl = slice(start, start + n_out)
            out = np.concatenate([ctx[sl], d1[sl], d2[sl]], axis=1)
            self._hist = np.concatenate([self._hist, self._pending[:n_out]])[
                -self._look :
            ]
            self._pending = self._pending[n_out:]
        else:
            out = self._pending[:n_out]
            self._pending = self._pending[n_out:]
        if self.cfg.cmn:
            if self._cmn_sum is None:
                self._cmn_sum = np.zeros(out.shape[1])
            self._cmn_sum += out.sum(axis=0)
            self._cmn_n += n_out
            out = out - self._cmn_sum[None, :] / self._cmn_n
        return out.astype(np.float32)

    def feed(self, samples: np.ndarray) -> np.ndarray:
        self._samples = np.concatenate([self._samples, np.asarray(samples, dtype=np.float64)])
        if self._samples.shape[0] >= self.flen:
            n_frames = 1 + (self._samples.shape[0] - self.flen) // self.shift
            idx = np.arange(self.flen)[None, :] + self.shift * np.arange(n_frames)[:, None]
            statics = self._statics(self._samples[idx])
            self._samples = self._samples[n_frames * self.shift :]
            self._pending = np.concatenate([self._pending, statics])
            self._started = True
        return self._emit(final=False)

    def flush(self) -> np.ndarray:
        """Emit the frames held back for lookahead (end of stream)."""
        if self._samples.shape[0] > 0 and not self._started:
            # whole stream shorter than one frame: pad like the batch path
            pad = np.pad(self._samples, (0, self.flen - self._samples.shape[0]))
            self._pending = self._statics(pad[None, :])
        self._samples = np.empty(0)
        return self._emit(final=True)


def capture_features(
    source: PcmSource,
    cfg: Optional[FrontendConfig] = None,
    chunk_samples: int = 1600,
) -> Iterator[np.ndarray]:
    """Generator: pull PCM from `source`, yield (n, D) feature chunks."""
    cfg = cfg or FrontendConfig(sample_rate=source.sample_rate)
    if cfg.sample_rate != source.sample_rate:
        cfg = replace(cfg, sample_rate=source.sample_rate)
    fe = StreamingFrontend(cfg)
    while True:
        x = source.read(chunk_samples)
        if x.size == 0:
            break
        out = fe.feed(x)
        if out.shape[0]:
            yield out
    tail = fe.flush()
    if tail.shape[0]:
        yield tail
