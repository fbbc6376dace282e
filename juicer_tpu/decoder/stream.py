"""Streaming decode with partial-result emission.

Rebuild of the reference's `PARTIAL_DECODING` support (compiled in by
default, `src/CMakeLists.txt:4`): the decoder periodically traces the
CONVERGED common prefix of all live paths and emits it as a stable partial
result (`WFSTDecoderLite::tracePartialPath`/`traceWinningPaths`,
`/root/reference/src/WFSTDecoderLite.cpp:822-896`), enabling unbounded-
length audio with constant-size device state (SURVEY.md §5 long-context
note).

Here: frames are fed in chunks through the jitted chunked scan (device
carry persists between chunks); traceback-arena records accumulate on the
host; after each chunk the common ancestor of every live token's path
chain is found and the words up to it are emitted once.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .ref_core import DecodeResult, WordHyp

NEG = -1.0e30


class StreamingDecoder:
    def __init__(self, decoder):
        import jax

        self.dec = decoder

        # device tables as jit args (see TpuDecoder._decode_jit)
        def _chunk_with_dev(dev, carry, scores, t0):
            saved = decoder.dev
            decoder.dev = dev
            try:
                return decoder._chunk_scan(carry, scores, t0)
            finally:
                decoder.dev = saved

        jitted = jax.jit(_chunk_with_dev)
        self._jit_chunk = lambda carry, scores, t0: jitted(
            decoder.dev, carry, scores, t0)
        self.carry = None
        self.rec0 = None
        self.t = 0
        # host-side record arena, appended per chunk
        self._recs: dict[str, list[np.ndarray]] = {
            k: [] for k in ("prev", "seq", "score", "ac", "lm", "src", "arc")
        }
        self._emitted_upto: int = -2  # path id up to which words were emitted
        self._emitted: list[WordHyp] = []

    # -- feeding -----------------------------------------------------------

    def feed(self, gmm_scores: np.ndarray) -> list[WordHyp]:
        """Process a chunk of (T_chunk, n_gmms) scores; returns NEWLY
        converged word hypotheses (stable partial results)."""
        import jax.numpy as jnp

        dec = self.dec
        if self.carry is None:
            self.carry, self.rec0 = dec._init_carry()
            self._r0 = {
                k: np.asarray(self.rec0[k])
                for k in ("prev", "seq", "score", "ac", "lm", "src", "arc")
            }
        scores = jnp.asarray(gmm_scores, dec._dt)
        self.carry, ys = self._jit_chunk(self.carry, scores, self.t)
        self.t += int(gmm_scores.shape[0])
        for k in self._recs:
            self._recs[k].append(np.asarray(ys[f"rec_{k}"]).reshape(-1))
        return self._trace_partial()

    # -- partial traceback -------------------------------------------------

    def _rec(self, name: str, pid: int):
        if pid >= 0:
            chunk_len = len(self._recs[name][0])
            # records are stored chunk-by-chunk; pid = t*K + slot
            flat_idx = pid
            acc = 0
            for arr in self._recs[name]:
                if flat_idx < acc + len(arr):
                    return arr[flat_idx - acc]
                acc += len(arr)
            raise IndexError(pid)
        return self._r0[name][pid + self.dec.K]

    def _chain(self, pid: int) -> list[int]:
        out = []
        guard = 0
        while pid != -1:
            out.append(pid)
            pid = int(self._rec("prev", pid))
            guard += 1
            if guard > 1000000:
                raise RuntimeError("path chain loop")
        return out

    def _trace_partial(self) -> list[WordHyp]:
        fr = self.carry["fr"]
        score = np.asarray(fr["score"])
        path = np.asarray(fr["path"])
        live = score > NEG / 2
        pids = np.unique(path[live])
        pids = pids[pids >= -1]
        # also the live best-final token path
        bf = self.carry["best_final"]
        bf_score = float(np.asarray(bf["score"]))
        if bf_score > NEG / 2:
            pids = np.unique(np.concatenate([pids, [int(np.asarray(bf["path"]))]]))
        if len(pids) == 0:
            return []
        # common ancestor: intersect chains
        chains = [self._chain(int(p)) for p in pids if p != -1]
        if any(p == -1 for p in pids) or not chains:
            common = []  # some token has an empty history: nothing converged
        else:
            common_set = set(chains[0])
            for c in chains[1:]:
                common_set &= set(c)
            # deepest common ancestor chain = suffix of any chain within set
            common = [p for p in chains[0] if p in common_set]
        # emit words not yet emitted (common is newest-first; path ids grow
        # with time so older records come last)
        seen = {getattr(h, "_pid", None) for h in self._emitted}
        new: list[WordHyp] = []
        for pid in reversed(common):
            if pid in seen:
                continue
            seq_id = int(self._rec("seq", pid))
            labs = self.dec.art.seqs[seq_id]
            frame = pid // self.dec.K if pid >= 0 else 0  # init words report frame 0
            s, a, l = (
                float(self._rec("score", pid)),
                float(self._rec("ac", pid)),
                float(self._rec("lm", pid)),
            )
            rem = self._remainders(pid, seq_id)
            for j, lab in enumerate(labs):
                if rem is not None and j < len(rem):
                    rs, rl, ra = rem[j]
                    h = WordHyp(lab, frame, s - rs, a - ra, l - rl)
                else:
                    h = WordHyp(lab, frame, s, a, l)
                h._pid = pid
                new.append(h)
        self._emitted.extend(new)
        return new

    def _remainders(self, pid: int, seq_id: int):
        """Crossing-time remainders for a record (None -> landing values)."""
        dec = self.dec
        if dec.otf:
            return None
        src = int(self._rec("src", pid))
        arc = int(self._rec("arc", pid))
        if src < 0 or arc < 0:
            return None
        return dec.art.remainders(src, arc, seq_id)

    # -- finishing ---------------------------------------------------------

    def finish(self) -> DecodeResult:
        """Final 1-best result for the whole stream."""
        dec = self.dec
        bf = {k: np.asarray(v) for k, v in self.carry["best_final"].items()}
        score = float(bf["score"])
        if score <= NEG / 2:
            return DecodeResult([], [], NEG, NEG, NEG, self.t)
        # mirror TpuDecoder._traceback: crossing-time per-label values via
        # artifact remainders; the overall-last label carries best-final
        segs: list[list[WordHyp]] = []
        fseq = dec.art.seqs[int(bf["seq"])]
        if fseq:
            rem = (
                dec.art.final_remainders(int(bf["src"]), int(bf["seq"]))
                if not dec.otf and int(bf["src"]) >= 0 else None
            )
            seg = []
            for j, lab in enumerate(fseq):
                if rem is not None and j < len(rem):
                    rs, rl, ra = rem[j]
                    seg.append(WordHyp(lab, self.t - 1, score - rs,
                                       float(bf["ac"]) - ra,
                                       float(bf["lm"]) - rl))
                else:
                    seg.append(WordHyp(lab, self.t - 1, score,
                                       float(bf["ac"]), float(bf["lm"])))
            seg[-1] = WordHyp(seg[-1].word, self.t - 1, score,
                              float(bf["ac"]), float(bf["lm"]))
            segs.append(seg)
        pid = int(bf["path"])
        first = not fseq
        while pid != -1:
            seq_id = int(self._rec("seq", pid))
            labs = dec.art.seqs[seq_id]
            s, a, l = (
                float(self._rec("score", pid)),
                float(self._rec("ac", pid)),
                float(self._rec("lm", pid)),
            )
            frame = pid // dec.K if pid >= 0 else 0  # init words report frame 0
            rem = self._remainders(pid, seq_id)
            seg = []
            for j, lab in enumerate(labs):
                if rem is not None and j < len(rem):
                    rs, rl, ra = rem[j]
                    seg.append(WordHyp(lab, frame, s - rs, a - ra, l - rl))
                else:
                    seg.append(WordHyp(lab, frame, s, a, l))
            if first and seg:
                seg[-1] = WordHyp(seg[-1].word, frame, score, float(bf["ac"]),
                                  float(bf["lm"]))
                first = False
            segs.append(seg)
            pid = int(self._rec("prev", pid))
        hyps = [h for seg in reversed(segs) for h in seg]
        return DecodeResult(
            words=[h.word for h in hyps],
            word_hyps=hyps,
            score=score,
            acoustic_score=float(bf["ac"]),
            lm_score=float(bf["lm"]),
            n_frames=self.t,
        )
