"""On-the-fly composition decoding: search CL while lazily intersecting G.

Rebuild of `WFSTOnTheFlyDecoder` (`/root/reference/src/WFSTOnTheFlyDecoder.{h,cpp}`,
`WFSTModelOnTheFly.{h,cpp}`): the reference searches C∘L with hypotheses
keyed by (CL position, G state) held in per-state linked lists/BSTs, and
intersects word labels against a `WFSTSortedInLabelNetwork` G with binary
search plus eps/backoff-path walking (`binarySearchInLabel`,
`getStatesOnEpsPath`, `WFSTNetwork.cpp:2505,2605`).

TPU-native redesign:
  - `GNetwork`: G as input-label-sorted CSR arrays + at most one backoff
    (eps/#phi) arc per state + precomputed final-reach weights (the
    backoff walk to a final state);
  - the oracle `RefOtfDecoder` extends the token-passing oracle with a
    per-token G state advanced on every word crossing (backoff chain
    followed until the word matches, LM weight accumulated);
  - `OtfTpuDecoder` (tpu_core variant) keys frontier slots by the PAIR
    (CL hmm arc, G state): all recombination sorts use two-component keys
    and the G advance is a vectorized bounded binary search over the
    sorted arc ranges.

Label-and-weight pushing (`WFSTLabelPushingNetwork` anticipated output
sets + `PushingWeightCache`) is implemented in the engine
(`tpu_core` otf_pushing mode: singleton anticipated labels add their G
weight at instance entry and are compensated at exit) and in the oracle
below; fuzz-checked against each other in tests/test_fuzz_parity.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..fst import EPSILON, Fst
from .network import DecoderNetwork
from .ref_core import RefDecoder, Token, DecodeResult

LOG_ZERO = -1e30


class GNetwork:
    """Grammar transducer in sorted-input-label CSR form with backoff arcs.

    Weights are decoder-internal (higher = better), i.e. negated costs,
    like `DecoderNetwork`. The backoff arc of a state is its single
    eps-input (or #phi-input) arc; ARPA-built G machines have at most one
    (`WFSTGramGen` emits one backoff arc per context).
    """

    def __init__(self, fst: Fst, lm_scale: float = 1.0, phi_label: int = -1,
                 pad_cap: int = 64):
        src, dst, il, ol, w = fst.arcs_numpy()
        weight = -w * lm_scale
        self.n_states = fst.num_states
        self.init_state = fst.start

        is_bo = (il == EPSILON) | ((phi_label > 0) & (il == phi_label))
        # backoff arcs
        self.bo_dst = np.full(self.n_states, -1, dtype=np.int32)
        self.bo_w = np.zeros(self.n_states, dtype=np.float64)
        for i in np.nonzero(is_bo)[0]:
            s = int(src[i])
            if self.bo_dst[s] >= 0:
                raise ValueError(f"G state {s} has multiple backoff arcs")
            self.bo_dst[s] = dst[i]
            self.bo_w[s] = weight[i]

        # word arcs sorted by (state, ilabel)
        keep = ~is_bo
        order = np.lexsort((il[keep], src[keep]))
        self.arc_il = il[keep][order].astype(np.int32)
        self.arc_dst = dst[keep][order].astype(np.int32)
        self.arc_w = weight[keep][order].astype(np.float64)
        self.row_ptr = np.zeros(self.n_states + 1, dtype=np.int64)
        np.add.at(self.row_ptr, src[keep][order] + 1, 1)
        self.row_ptr = np.cumsum(self.row_ptr)

        # final weights + backoff-reach closure: from each state, follow
        # backoff arcs until a final state (getStatesOnEpsPath analogue)
        self.final_w = np.full(self.n_states, LOG_ZERO, dtype=np.float64)
        for s, fw in fst.finals.items():
            self.final_w[s] = -fw * lm_scale
        self.final_reach = np.array(
            [self._final_reach(s) for s in range(self.n_states)], dtype=np.float64
        )
        self.max_backoff = self._max_backoff_depth()
        self._build_tpu_tables(pad_cap=pad_cap)

    def _build_tpu_tables(self, pad_cap: int) -> None:
        """TPU lookup layout replacing the reference's per-hypothesis
        `binarySearchInLabel` + `PushingWeightCache`
        (`WFSTOnTheFlyDecoder.h:253-371`): arbitrary-index binary search
        serializes per index on TPU, so instead each state's sorted word
        arcs are PADDED into (n_states, R) tables — a frontier's G lookups
        become one packed row-gather + a lane compare. States whose rows
        exceed R (e.g. the unigram root, which has an arc per vocab word)
        get a dense word-indexed (D, W) table instead."""
        nG = self.n_states
        row_n = np.diff(self.row_ptr)
        self.W = int(self.arc_il.max(initial=0)) + 1
        R = int(min(max(row_n.max(initial=1), 1), pad_cap))
        self.pad_R = R
        dense_mask = row_n > R
        dense_states = np.nonzero(dense_mask)[0]
        self.dense_idx = np.full(nG, -1, np.int32)
        self.dense_idx[dense_states] = np.arange(len(dense_states), dtype=np.int32)
        D = max(len(dense_states), 1)
        self.dense_dst = np.full((D, self.W), -1, np.int32)
        self.dense_w = np.zeros((D, self.W), np.float64)
        for k, s in enumerate(dense_states):
            lo, hi = int(self.row_ptr[s]), int(self.row_ptr[s + 1])
            # reversed assignment so the FIRST of duplicate (state, il)
            # arcs wins, matching both the packed-row path's cumsum guard
            # and the reference's binarySearchInLabel (which lands on the
            # first entry of an equal-label run)
            rev = slice(hi - 1, lo - 1 if lo else None, -1)
            self.dense_dst[k, self.arc_il[rev]] = self.arc_dst[rev]
            self.dense_w[k, self.arc_il[rev]] = self.arc_w[rev]
        if len(dense_states) * self.W > 4_000_000:
            import warnings

            warnings.warn(
                f"GNetwork: {len(dense_states)} G states exceed pad_cap="
                f"{R}; dense word tables are {len(dense_states)}x{self.W} "
                f"({len(dense_states) * self.W * 12 / 1e6:.0f} MB). "
                f"Raise pad_cap to shrink them."
            )
        # padded rows for sparse states (il 0 = eps can never match a word)
        self.pad_il = np.zeros((nG, R), np.int32)
        self.pad_dst = np.zeros((nG, R), np.int32)
        self.pad_w = np.zeros((nG, R), np.float64)
        n_arcs = len(self.arc_il)
        if n_arcs:
            arc_state = np.repeat(np.arange(nG), row_n)
            within = np.arange(n_arcs) - self.row_ptr[arc_state]
            sel = ~dense_mask[arc_state]
            self.pad_il[arc_state[sel], within[sel]] = self.arc_il[sel]
            self.pad_dst[arc_state[sel], within[sel]] = self.arc_dst[sel]
            self.pad_w[arc_state[sel], within[sel]] = self.arc_w[sel]

    def _final_reach(self, s: int) -> float:
        w = 0.0
        seen = set()
        while s >= 0 and s not in seen:
            if self.final_w[s] > LOG_ZERO:
                return w + self.final_w[s]
            seen.add(s)
            w += self.bo_w[s]
            s = int(self.bo_dst[s])
        return LOG_ZERO

    def _max_backoff_depth(self) -> int:
        depth = np.zeros(self.n_states, dtype=np.int64)
        # longest backoff chain (acyclic for ARPA machines)
        changed = True
        it = 0
        while changed and it <= self.n_states:
            changed = False
            it += 1
            for s in range(self.n_states):
                d = self.bo_dst[s]
                if d >= 0 and depth[s] < depth[d] + 1:
                    depth[s] = depth[d] + 1
                    changed = True
        return int(depth.max(initial=0)) + 1

    def advance(self, g: int, word: int) -> tuple[int, float]:
        """Consume `word` from state g via match-or-backoff; returns
        (next state, accumulated weight) or (-1, LOG_ZERO)."""
        w = 0.0
        for _ in range(self.max_backoff + 1):
            lo, hi = int(self.row_ptr[g]), int(self.row_ptr[g + 1])
            i = lo + int(np.searchsorted(self.arc_il[lo:hi], word))
            if i < hi and self.arc_il[i] == word:
                return int(self.arc_dst[i]), w + float(self.arc_w[i])
            if self.bo_dst[g] < 0:
                return -1, LOG_ZERO
            w += float(self.bo_w[g])
            g = int(self.bo_dst[g])
        return -1, LOG_ZERO


class _OtfToken(Token):
    pass


class RefOtfDecoder(RefDecoder):
    """Oracle on-the-fly decoder: tokens carry a G state; insts keyed by
    (CL arc, G state)."""

    def __init__(self, cl_network: DecoderNetwork, g_network: GNetwork, models, **kw):
        super().__init__(cl_network, models, **kw)
        self.g = g_network

    # tokens get a .g attribute; entry merge key includes it
    def _start(self) -> None:
        self._init_g = self.g.init_state
        super()._start()

    def _propagate_token(self, tok, arc) -> None:
        net = self.net
        g_net = self.g
        if getattr(tok, "g", None) is None:
            tok.g = self._init_g
        if arc is not None:
            olabel = int(net.arc_olabel[arc])
            if olabel != 0:
                # advance G on the word crossing; LM weight onto the token
                g2, gw = g_net.advance(tok.g, olabel)
                if g2 < 0:
                    return  # word not in G from this context: hypothesis dies
                tok.g = g2
                tok.score += gw
                tok.lm += gw
                tok.path = self._new_path(tok, olabel)
            to_state = int(net.arc_dst[arc])
            fw = net.final_weight[to_state]
            if fw > LOG_ZERO:
                gfw = g_net.final_reach[tok.g]
                if gfw > LOG_ZERO and tok.score + fw + gfw > self.best_final.score:
                    self.best_final = tok.copy()
                    self.best_final.g = tok.g
                    self.best_final.score += fw + gfw
                    self.best_final.lm += fw + gfw
            next_state = to_state
        else:
            next_state = net.init_state

        for nxt in net.arcs_from(next_state):
            ilabel = int(net.arc_ilabel[nxt])
            w = float(net.arc_weight[nxt])
            if ilabel == 0:
                tmp = tok.copy()
                tmp.g = tok.g
                tmp.score += w
                tmp.lm += w
                if tmp.score > self.cur_end_thresh:
                    self._propagate_token(tmp, nxt)
            else:
                hmm = ilabel - 1
                key = (nxt, tok.g)
                inst = self.insts.get(key)
                if inst is None:
                    from .ref_core import _Inst

                    n = self.models.get_num_states(hmm)
                    inst = _Inst(nxt, hmm, n, self.models.get_tee_log_prob(hmm))
                    inst.g = tok.g
                    self.insts[key] = inst
                    self.new_active.insert(0, key)

                entry = inst.states[0]
                new_score = tok.score + w
                if new_score > entry.score:
                    if entry.score <= LOG_ZERO:
                        inst.n_active += 1
                    ntok = tok.copy()
                    ntok.g = tok.g
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
                    tmp.g = tok.g
                    tmp.score = tee_score
                    tmp.acoustic += inst.tee
                    tmp.lm += w
                    thresh = (
                        self.cur_word_thresh
                        if int(net.arc_olabel[nxt]) != 0
                        else self.cur_end_thresh
                    )
                    if tee_score > thresh:
                        self._propagate_token(tmp, nxt)

    def _do_external(self) -> None:
        # same as base but inst keys are (arc, g) pairs
        self.best_start = LOG_ZERO
        survivors = []
        for key in self.active:
            inst = self.insts.get(key)
            if inst is None:
                continue
            exit_tok = inst.states[inst.n_states - 1]
            if exit_tok.score > LOG_ZERO:
                arc = inst.arc
                olabel = int(self.net.arc_olabel[arc])
                thresh = self.cur_end_thresh if olabel == 0 else self.cur_word_thresh
                if exit_tok.score > thresh:
                    t2 = exit_tok.copy()
                    t2.g = inst.g
                    self._propagate_token(t2, arc)
                inst.states[inst.n_states - 1] = Token()
                inst.n_active -= 1
                if inst.n_active == 0:
                    del self.insts[key]
                    continue
            survivors.append(key)
        self.active = [k for k in survivors if k in self.insts]
        self._join_new_active()

    def _do_internal(self) -> None:
        survivors = []
        self.best_emit = LOG_ZERO
        self.best_end = LOG_ZERO
        for key in self.active:
            inst = self.insts[key]
            entry = inst.states[0]
            if entry.score > LOG_ZERO and entry.score < self.cur_start_thresh:
                inst.states[0] = Token()
                inst.n_active -= 1
            self._internal_one(inst)
            if inst.n_active == 0:
                del self.insts[key]
            else:
                survivors.append(key)
        self.active = survivors

    def decode(self, *a, **kw) -> DecodeResult:
        res = super().decode(*a, **kw)
        return res
