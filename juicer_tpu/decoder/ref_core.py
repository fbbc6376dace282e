"""Reference (oracle) decoder: exact `WFSTDecoderLite` semantics in numpy.

A direct behavioral transcription of the token-passing core
(`/root/reference/src/WFSTDecoderLite.cpp`) used as the conformance oracle
for the TPU engine (float64 scores = the USE_DOUBLE_SCORE analogue):

  - per-frame sequence: newFrame -> threshold update (histogram ∧ main
    beam) -> HMM-internal Viterti + GMM eval + emit pruning -> end/word
    threshold update -> external propagation through arcs with recursive
    eps/tee handling -> (no GC needed here) (`processFrame`, `:311-372`);
  - scores normalized each frame by the previous frame's best emitting
    score (`normaliseScore`, `:321,408`);
  - entry-state LM pruning against the start beam (`:914-918`);
  - word-boundary Path records created when a token crosses an arc with a
    non-eps output label (`propagateToken`, `:496-509`);
  - histogram pruning with integer-binned scores
    (`Histogram::{addScore,calcThresh}`, `Histogram.cpp`).

Pruning windows of 0.0 disable the respective beam, as in the reference.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from .network import DecoderNetwork

LOG_ZERO = -1e30


@dataclass
class PathRec:
    prev: int  # index into paths list, -1 none
    frame: int
    score: float
    acoustic: float
    lm: float
    label: int


@dataclass
class Token:
    score: float = LOG_ZERO
    acoustic: float = LOG_ZERO
    lm: float = LOG_ZERO
    path: int = -1

    def copy(self) -> "Token":
        return Token(self.score, self.acoustic, self.lm, self.path)


NULL_TOKEN = Token()


class _Inst:
    # "g" is used by the on-the-fly composition subclass (decoder/otf.py)
    __slots__ = ("arc", "hmm", "n_states", "states", "tee", "n_active", "g")

    def __init__(self, arc: int, hmm: int, n_states: int, tee: float):
        self.arc = arc
        self.hmm = hmm
        self.n_states = n_states
        self.states = [Token() for _ in range(n_states)]
        self.tee = tee
        self.n_active = 0


class _Histogram:
    """Integer-binned score histogram (`Histogram.cpp`, binWidth=1)."""

    def __init__(self, min_score: float, max_score: float):
        # the reference widens by one on each side (`Histogram.cpp:28-30`)
        self.min_score = int(min_score - 1.0)
        self.max_score = int(max_score + 1.0)
        self.reset()

    def reset(self) -> None:
        self.counts: dict[int, int] = {}
        self.count = 0

    def add(self, score: float) -> None:
        sc = int(score - 0.5) if score < 0.0 else int(score + 0.5)
        if sc > self.max_score:
            sc = self.max_score
        if sc < self.min_score:
            return
        self.counts[sc] = self.counts.get(sc, 0) + 1
        self.count += 1

    def calc_thresh(self, max_n: int) -> float:
        if self.count <= max_n:
            return float(self.min_score) - 0.5
        total = 0
        for sc in sorted(self.counts, reverse=True):
            total += self.counts[sc]
            if total >= max_n:
                return float(sc) - 0.5
        return float(self.min_score) - 0.5


@dataclass
class WordHyp:
    word: int
    end_frame: int
    score: float
    acoustic: float
    lm: float


@dataclass
class DecodeResult:
    words: list[int]  # output label ids (1-based network labels)
    word_hyps: list[WordHyp]
    score: float
    acoustic_score: float
    lm_score: float
    n_frames: int
    avg_active: float = 0.0  # mean active insts per frame (observability)
    max_active: int = 0  # peak frontier occupancy (budget autotuning)
    max_cand: int = 0  # peak per-frame expansion candidates
    overflow: bool = False  # a frontier/expansion budget bound somewhere

    @property
    def empty(self) -> bool:
        return self.score <= LOG_ZERO


class RefDecoder:
    def __init__(
        self,
        network: DecoderNetwork,
        models,  # AcousticModelSet-like
        phone_start_prune_win: float = 0.0,
        emit_prune_win: float = 0.0,
        phone_end_prune_win: float = 0.0,
        word_prune_win: float = 0.0,
        max_emit_hyps: int = 0,
    ):
        self.net = network
        self.models = models
        self.emit_prune_win = emit_prune_win
        self.phone_start_prune_win = phone_start_prune_win
        self.phone_end_prune_win = phone_end_prune_win
        self.word_prune_win = word_prune_win
        self.max_emit_hyps = max_emit_hyps
        if max_emit_hyps > 0:
            lo = -emit_prune_win - 800.0 if emit_prune_win > 0.0 else -1000.0
            self.histogram: Optional[_Histogram] = _Histogram(lo, 200.0)
        else:
            self.histogram = None

    # -- public ------------------------------------------------------------

    def decode(
        self,
        features: Optional[np.ndarray] = None,
        score_fn: Optional[Callable[[int, int], float]] = None,
        n_frames: Optional[int] = None,
    ) -> DecodeResult:
        """Decode one utterance.

        Either `features` (T, D) scored through the model set, or a
        `score_fn(t, gmm_index) -> log-likelihood` with `n_frames` (used
        for bit-exact cross-checks against the TPU core).
        """
        if score_fn is None:
            assert features is not None
            T = features.shape[0]
            cache: dict[tuple[int, int], float] = {}

            def score_fn(t: int, gmm: int) -> float:
                key = (t, gmm)
                v = cache.get(key)
                if v is None:
                    v = self.models.score_gmm(gmm, features[t])
                    cache[key] = v
                return v
        else:
            T = n_frames

        self._score_fn = score_fn
        self._start()
        for t in range(T):
            self._process_frame(t)
        return self._finish(T)

    # -- internals ---------------------------------------------------------

    def _start(self) -> None:
        self.paths: list[PathRec] = []
        self.insts: dict[int, _Inst] = {}  # arc id -> inst (the `hook`)
        self.active: list[int] = []  # active arc ids, front-inserted order
        self.new_active: list[int] = []
        self.best_final = NULL_TOKEN.copy()
        self.normalise_score = 0.0
        self.best_emit = LOG_ZERO
        self.best_start = LOG_ZERO
        self.best_end = LOG_ZERO
        self.cur_start_thresh = LOG_ZERO
        self.cur_end_thresh = LOG_ZERO
        self.cur_word_thresh = LOG_ZERO
        self.cur_emit_thresh = LOG_ZERO
        if self.histogram:
            self.histogram.reset()
        # recognitionStart() runs the initial propagation with currFrame
        # already 0 (`WFSTDecoderLite.cpp:141`): words crossed before the
        # first frame are reported at frame 0, not -1 (conformance-checked
        # against the reference binary, tests/test_ref_decoder.py)
        self.current_frame = 0
        tok = Token(0.0, 0.0, 0.0, -1)
        self._propagate_token(tok, None)
        self._join_new_active()

    def _join_new_active(self) -> None:
        # new insts are prepended to the active list (`joinNewActiveInstList`)
        self.active = self.new_active + self.active
        self.new_active = []

    def _process_frame(self, t: int) -> None:
        self.current_frame = t
        self.best_final = NULL_TOKEN.copy()

        # <<Update start & emit pruning thresholds>>
        self.normalise_score = self.best_emit if self.best_emit > LOG_ZERO else 0.0
        if self.histogram:
            self.cur_emit_thresh = self.histogram.calc_thresh(self.max_emit_hyps)
            self.cur_emit_thresh -= self.normalise_score
            if self.emit_prune_win > 0.0 and self.cur_emit_thresh < -self.emit_prune_win:
                self.cur_emit_thresh = -self.emit_prune_win
            self.histogram.reset()
        else:
            self.cur_emit_thresh = (
                -self.emit_prune_win if self.emit_prune_win > 0.0 else LOG_ZERO
            )
        self.cur_start_thresh = (
            self.best_start - self.phone_start_prune_win
            if self.phone_start_prune_win > 0.0
            else LOG_ZERO
        )

        self._do_internal()

        self.cur_end_thresh = (
            self.best_end - self.phone_end_prune_win
            if self.phone_end_prune_win > 0.0
            else LOG_ZERO
        )
        self.cur_word_thresh = (
            self.best_end - self.word_prune_win if self.word_prune_win > 0.0 else LOG_ZERO
        )

        self._do_external()

    def _do_internal(self) -> None:
        self.best_emit = LOG_ZERO
        self.best_end = LOG_ZERO
        survivors = []
        for arc in self.active:
            inst = self.insts[arc]
            entry = inst.states[0]
            if entry.score > LOG_ZERO and entry.score < self.cur_start_thresh:
                inst.states[0] = Token()
                inst.n_active -= 1
            self._internal_one(inst)
            if inst.n_active == 0:
                # deactivate (`returnNetInst`): tokens already nulled
                del self.insts[arc]
            else:
                survivors.append(arc)
        self.active = survivors

    def _internal_one(self, inst: _Inst) -> None:
        net = self.net
        hmm = inst.hmm
        N1 = inst.n_states - 1
        trP = self.models.get_trans_mat(hmm)
        se = self.models.get_se_index(hmm)  # entries for states 1..N-1
        t = self.current_frame
        gmm_inds = self.models.hmm_gmm_inds[hmm]

        buf = [None] * N1  # results for states 0..N1-1 (entry stays null)
        buf[0] = Token()
        for j in range(1, N1):
            lo, hi = se[j - 1]
            res = inst.states[lo].copy()
            res.score += trP[lo][j]
            res.acoustic += trP[lo][j]
            for i in range(lo + 1, hi):
                tmp = inst.states[i].score + trP[i][j]
                if tmp > res.score:
                    res = inst.states[i].copy()
                    res.score = tmp
                    res.acoustic += trP[i][j]
            res.score -= self.normalise_score
            if res.score > self.cur_emit_thresh:
                outp = self._score_fn(t, int(gmm_inds[j - 1]))
                res.score += outp
                res.acoustic += outp
                if self.histogram:
                    self.histogram.add(res.score)
                if res.score > self.best_emit:
                    self.best_emit = res.score
            else:
                res = Token()
            buf[j] = res

        inst.n_active = 0
        for j in range(N1):
            if buf[j].score > LOG_ZERO:
                inst.n_active += 1
            inst.states[j] = buf[j]

        # exit state (tee transition excluded from SEIndex)
        lo, hi = se[N1 - 1]
        res = inst.states[lo].copy()
        res.score += trP[lo][N1]
        res.acoustic += trP[lo][N1]
        for i in range(lo + 1, hi):
            tmp = inst.states[i].score + trP[i][N1]
            if tmp > res.score:
                res = inst.states[i].copy()
                res.score = tmp
                res.acoustic += trP[i][N1]
        if res.score <= LOG_ZERO:
            inst.states[N1] = Token()
        else:
            inst.states[N1] = res
            if res.score > self.best_end:
                self.best_end = res.score
            inst.n_active += 1

    def _do_external(self) -> None:
        self.best_start = LOG_ZERO
        survivors = []
        for arc in self.active:
            inst = self.insts.get(arc)
            if inst is None:
                survivors.append(arc)
                continue
            exit_tok = inst.states[inst.n_states - 1]
            if exit_tok.score > LOG_ZERO:
                olabel = int(self.net.arc_olabel[arc])
                thresh = self.cur_end_thresh if olabel == 0 else self.cur_word_thresh
                if exit_tok.score > thresh:
                    self._propagate_token(exit_tok.copy(), arc)
                inst.states[inst.n_states - 1] = Token()
                inst.n_active -= 1
                if inst.n_active == 0:
                    del self.insts[arc]
                    continue
            survivors.append(arc)
        self.active = [a for a in survivors if a in self.insts]
        self._join_new_active()

    def _new_path(self, tok: Token, label: int) -> int:
        self.paths.append(
            PathRec(tok.path, self.current_frame, tok.score, tok.acoustic, tok.lm, label)
        )
        return len(self.paths) - 1

    def _propagate_token(self, tok: Token, arc: Optional[int]) -> None:
        net = self.net
        if arc is not None:
            olabel = int(net.arc_olabel[arc])
            if olabel != 0:
                tok.path = self._new_path(tok, olabel)
            to_state = int(net.arc_dst[arc])
            fw = net.final_weight[to_state]
            if fw > LOG_ZERO:
                if tok.score + fw > self.best_final.score:
                    self.best_final = tok.copy()
                    self.best_final.score += fw
                    self.best_final.lm += fw
            next_state = to_state
        else:
            next_state = net.init_state

        for nxt in net.arcs_from(next_state):
            ilabel = int(net.arc_ilabel[nxt])
            w = float(net.arc_weight[nxt])
            if ilabel == 0:
                tmp = tok.copy()
                tmp.score += w
                tmp.lm += w
                if tmp.score > self.cur_end_thresh:
                    self._propagate_token(tmp, nxt)
            else:
                hmm = ilabel - 1
                inst = self.insts.get(nxt)
                if inst is None:
                    n = self.models.get_num_states(hmm)
                    inst = _Inst(nxt, hmm, n, self.models.get_tee_log_prob(hmm))
                    self.insts[nxt] = inst
                    self.new_active.insert(0, nxt)
                elif inst.n_active == 0 and nxt not in self.new_active and nxt not in self.active:
                    self.new_active.insert(0, nxt)

                entry = inst.states[0]
                new_score = tok.score + w
                if new_score > entry.score:
                    if entry.score <= LOG_ZERO:
                        inst.n_active += 1
                    ntok = tok.copy()
                    ntok.score = new_score
                    ntok.lm += w
                    inst.states[0] = ntok
                    if new_score > self.best_emit:
                        self.best_emit = new_score
                    if new_score > self.best_start:
                        self.best_start = new_score

                if inst.tee > LOG_ZERO:
                    tee_score = new_score + inst.tee
                    tmp = tok.copy()
                    tmp.score = tee_score
                    tmp.acoustic += inst.tee
                    tmp.lm += w
                    if int(net.arc_olabel[nxt]) != 0:
                        if tee_score > self.cur_word_thresh:
                            self._propagate_token(tmp, nxt)
                    else:
                        if tee_score > self.cur_end_thresh:
                            self._propagate_token(tmp, nxt)

    def _finish(self, T: int) -> DecodeResult:
        best = self.best_final
        if best.score <= LOG_ZERO:
            return DecodeResult([], [], LOG_ZERO, LOG_ZERO, LOG_ZERO, T)
        hyps: list[WordHyp] = []
        p = best.path
        first = True
        while p >= 0:
            rec = self.paths[p]
            if first:
                # the final hypothesis carries the added final-state weight
                hyps.append(WordHyp(rec.label, rec.frame, best.score, best.acoustic, best.lm))
                first = False
            else:
                hyps.append(WordHyp(rec.label, rec.frame, rec.score, rec.acoustic, rec.lm))
            p = rec.prev
        hyps.reverse()
        return DecodeResult(
            words=[h.word for h in hyps],
            word_hyps=hyps,
            score=best.score,
            acoustic_score=best.acoustic,
            lm_score=best.lm,
            n_frames=T,
        )
