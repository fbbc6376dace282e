"""Compiled TPU decoding artifact.

Transforms a `DecoderNetwork` + `AcousticModelSet` into the flat tensors the
TPU engine consumes (SURVEY.md §7 design translation):

  - the HMM-arc subset (arcs with non-eps input labels) becomes the "inst"
    key space: `hmm_arc_*` arrays (hmm index, dst state, weight, olabel);
  - the recursive eps/tee traversal of `WFSTDecoderLite::propagateToken`
    (`/root/reference/src/WFSTDecoderLite.cpp:491-605`) is *precomputed*
    into per-arc expansion tables: for every HMM arc A, all HMM arcs B
    reachable from A's destination via eps arcs and tee (entry->exit) HMM
    hops, with accumulated (total, lm, acoustic) weight deltas and the
    sequence of output labels crossed (A's own olabel included);
  - final-state reachability along the same traversal becomes per-arc
    "final entry" tables (the bestFinalToken updates);
  - the initial propagation (`recognitionStart` ->
    propagateToken(empty, NULL)) becomes entry/final tables for a virtual
    "start" source.

Output-label sequences are interned in a side table (`seqs`); most entries
have 0 or 1 labels.

Caveat: mid-traversal beam tests (`currEndPruneThresh` per eps hop) cannot
be applied inside a precomputed closure; entries that the reference would
have pruned *mid-path* survive here until the entry merge. This only
changes results when such a path would also win the merge — impossible
unless the pruning windows are tighter than the path's weight drop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..am.models import AcousticModelSet
from .network import DecoderNetwork

LOG_ZERO = -1e30


@dataclass
class Expansion:
    """CSR expansion tables keyed by source (n_hmm_arcs + 1 virtual start)."""

    row_ptr: np.ndarray  # (n_src+1,) int64
    arc: np.ndarray  # (n_entries,) int32: target hmm-arc index
    w_score: np.ndarray  # (n_entries,) f64: score delta (lm + acoustic)
    w_lm: np.ndarray  # (n_entries,) f64
    w_ac: np.ndarray  # (n_entries,) f64
    seq: np.ndarray  # (n_entries,) int32: label-sequence id

    frow_ptr: np.ndarray  # (n_src+1,) int64: final-entry CSR
    f_score: np.ndarray  # score delta incl. final weight
    f_lm: np.ndarray
    f_ac: np.ndarray
    f_seq: np.ndarray


class DecoderArtifact:
    def __init__(
        self,
        network: DecoderNetwork,
        models: AcousticModelSet,
        max_closure_entries_per_state: int = 100000,
    ):
        self.net = network
        self.models = models

        net = network
        # ---- HMM-arc subset ------------------------------------------------
        hmm_mask = net.arc_ilabel > 0
        self.hmm_arc_ids = np.nonzero(hmm_mask)[0].astype(np.int64)
        self.n_hmm_arcs = len(self.hmm_arc_ids)
        # map global arc id -> hmm-arc index
        self._global_to_hmm = np.full(net.n_arcs, -1, dtype=np.int64)
        self._global_to_hmm[self.hmm_arc_ids] = np.arange(self.n_hmm_arcs)
        self.arc_hmm = (net.arc_ilabel[self.hmm_arc_ids] - 1).astype(np.int32)
        self.arc_weight = net.arc_weight[self.hmm_arc_ids].astype(np.float64)
        self.arc_olabel = net.arc_olabel[self.hmm_arc_ids].astype(np.int32)
        self.arc_dst = net.arc_dst[self.hmm_arc_ids].astype(np.int32)

        # ---- topology ------------------------------------------------------
        (self.trP, self.state_gmm, self.hmm_n_states, self.tee) = models.packed_topology()
        self.S = self.trP.shape[1]

        # ---- label-sequence interning -------------------------------------
        self._seq_index: dict[tuple[int, ...], int] = {(): 0}
        self.seqs: list[tuple[int, ...]] = [()]

        # ---- eps/tee closure per state ------------------------------------
        self._state_entries: dict[int, list] = {}
        self._state_finals: dict[int, list] = {}
        self._cum_entries: dict[int, tuple] = {}
        self._remainder_cache: dict[tuple, Optional[list]] = {}
        self._fremainder_cache: dict[tuple, Optional[list]] = {}
        self._max_entries = max_closure_entries_per_state
        self._native = self._try_native_closure()
        self.expansion = self._build_expansion()

    def _try_native_closure(self):
        """Run the eps/tee closure in the native library (C++ DFS), the
        host-side hot spot at WSJ scale. Returns the raw per-state tables
        or None (pure-Python fallback in `_state_closure`)."""
        try:
            from ..native import closure as native_closure
        except ImportError:
            return None
        net = self.net
        hmm_arc_index = np.full(net.n_arcs, -1, dtype=np.int64)
        hmm_arc_index[self.hmm_arc_ids] = np.arange(self.n_hmm_arcs)
        # per-hmm tee table sized by the max ilabel
        max_il = int(net.arc_ilabel.max(initial=0))
        tee_tab = np.full(max(max_il, 1), LOG_ZERO, dtype=np.float64)
        for h in range(min(self.models.n_hmms, max_il)):
            tee_tab[h] = self.tee[h]
        try:
            return native_closure(
                net.n_states, net.row_ptr, net.arc_dst, net.arc_ilabel,
                net.arc_olabel, net.arc_weight, net.final_weight, tee_tab,
                hmm_arc_index, self._max_entries,
            )
        except RuntimeError:
            return None

    # -- label sequences ----------------------------------------------------

    def intern_seq(self, seq: tuple[int, ...]) -> int:
        i = self._seq_index.get(seq)
        if i is None:
            i = len(self.seqs)
            self._seq_index[seq] = i
            self.seqs.append(seq)
        return i

    # -- closure ------------------------------------------------------------

    def _state_closure(self, state: int):
        """Entries/finals reachable from `state` via eps arcs and tee hops.

        Returns (entries, finals):
          entries: list of (hmm_arc, w_score, w_lm, w_ac, seq tuple)
          finals:  list of (w_score(+final), w_lm(+final), w_ac, seq tuple)
        Traversal order matches the reference's depth-first arc order;
        cycles are cut at repeated states on the current path.
        """
        cached = self._state_entries.get(state)
        if cached is not None:
            return cached, self._state_finals[state]

        if self._native is not None:
            nt = self._native
            lab = nt["labels"]
            lo, hi = int(nt["ent_row_ptr"][state]), int(nt["ent_row_ptr"][state + 1])
            entries = [
                (
                    int(nt["ent_arc"][i]),
                    float(nt["ent_wlm"][i] + nt["ent_wac"][i]),
                    float(nt["ent_wlm"][i]),
                    float(nt["ent_wac"][i]),
                    tuple(
                        lab[nt["ent_seq_off"][i] : nt["ent_seq_off"][i]
                            + nt["ent_seq_len"][i]].tolist()
                    ),
                )
                for i in range(lo, hi)
            ]
            lo, hi = int(nt["fin_row_ptr"][state]), int(nt["fin_row_ptr"][state + 1])
            finals = [
                (
                    float(nt["fin_wlm"][i] + nt["fin_wac"][i]),
                    float(nt["fin_wlm"][i]),
                    float(nt["fin_wac"][i]),
                    tuple(
                        lab[nt["fin_seq_off"][i] : nt["fin_seq_off"][i]
                            + nt["fin_seq_len"][i]].tolist()
                    ),
                )
                for i in range(lo, hi)
            ]
            self._state_entries[state] = entries
            self._state_finals[state] = finals
            return entries, finals

        net = self.net
        entries: list = []
        finals: list = []

        def visit(s: int, w_lm: float, w_ac: float, seq: tuple, on_path: frozenset):
            if len(entries) > self._max_entries:
                raise RuntimeError("eps/tee closure blow-up; network has huge eps fanout")
            fw = net.final_weight[s]
            if fw > LOG_ZERO:
                finals.append((w_lm + w_ac + fw, w_lm + fw, w_ac, seq))
            for ai in net.arcs_from(s):
                il = int(net.arc_ilabel[ai])
                w = float(net.arc_weight[ai])
                ol = int(net.arc_olabel[ai])
                dst = int(net.arc_dst[ai])
                if il == 0:
                    nseq = seq + ((ol,) if ol != 0 else ())
                    if dst in on_path:
                        continue  # eps cycle: a second lap can never win a max-merge
                    visit(dst, w_lm + w, w_ac, nseq, on_path | {dst})
                else:
                    hidx = int(self._global_to_hmm[ai])
                    entries.append((hidx, w_lm + w_ac + w, w_lm + w, w_ac, seq))
                    tee = float(self.tee[il - 1])
                    if tee > LOG_ZERO:
                        # tee hop: crossing the arc emits its olabel
                        nseq = seq + ((ol,) if ol != 0 else ())
                        if dst in on_path:
                            continue
                        visit(dst, w_lm + w, w_ac + tee, nseq, on_path | {dst})

        visit(state, 0.0, 0.0, (), frozenset([state]))
        self._state_entries[state] = entries
        self._state_finals[state] = finals
        return entries, finals

    def _build_expansion(self) -> Expansion:
        rows = []
        frows = []
        for a in range(self.n_hmm_arcs):
            dst = int(self.arc_dst[a])
            own = (int(self.arc_olabel[a]),) if self.arc_olabel[a] != 0 else ()
            ents, fins = self._state_closure(dst)
            rows.append(
                [
                    (b, ws, wl, wa, self.intern_seq(own + seq))
                    for (b, ws, wl, wa, seq) in ents
                ]
            )
            frows.append(
                [
                    (ws, wl, wa, self.intern_seq(own + seq))
                    for (ws, wl, wa, seq) in fins
                ]
            )
        # virtual start source (index n_hmm_arcs)
        ents, fins = self._state_closure(self.net.init_state)
        rows.append([(b, ws, wl, wa, self.intern_seq(seq)) for (b, ws, wl, wa, seq) in ents])
        frows.append([(ws, wl, wa, self.intern_seq(seq)) for (ws, wl, wa, seq) in fins])

        def pack(rows, n_fields):
            counts = np.array([len(r) for r in rows], dtype=np.int64)
            row_ptr = np.concatenate([[0], np.cumsum(counts)])
            flat = [x for r in rows for x in r]
            cols = list(zip(*flat)) if flat else [[] for _ in range(n_fields)]
            return row_ptr, cols

        row_ptr, cols = pack(rows, 5)
        frow_ptr, fcols = pack(frows, 4)
        return Expansion(
            row_ptr=row_ptr,
            arc=np.asarray(cols[0], dtype=np.int32),
            w_score=np.asarray(cols[1], dtype=np.float64),
            w_lm=np.asarray(cols[2], dtype=np.float64),
            w_ac=np.asarray(cols[3], dtype=np.float64),
            seq=np.asarray(cols[4], dtype=np.int32),
            frow_ptr=frow_ptr,
            f_score=np.asarray(fcols[0], dtype=np.float64),
            f_lm=np.asarray(fcols[1], dtype=np.float64),
            f_ac=np.asarray(fcols[2], dtype=np.float64),
            f_seq=np.asarray(fcols[3], dtype=np.int32),
        )

    # -- binary cache --------------------------------------------------------

    def save_npz(self, path: str) -> None:
        """Cache the compiled expansion (the WSJ-scale build is minutes of
        closure DFS + packing; reloading is seconds)."""
        ex = self.expansion
        seq_flat = np.concatenate(
            [np.asarray(s, np.int32) for s in self.seqs if s]
            or [np.zeros(0, np.int32)]
        )
        seq_len = np.asarray([len(s) for s in self.seqs], np.int32)
        np.savez_compressed(
            path,
            hmm_arc_ids=self.hmm_arc_ids,
            arc_hmm=self.arc_hmm, arc_weight=self.arc_weight,
            arc_olabel=self.arc_olabel, arc_dst=self.arc_dst,
            trP=self.trP, state_gmm=self.state_gmm,
            hmm_n_states=self.hmm_n_states, tee=self.tee,
            row_ptr=ex.row_ptr, ent_arc=ex.arc, w_score=ex.w_score,
            w_lm=ex.w_lm, w_ac=ex.w_ac, ent_seq=ex.seq,
            frow_ptr=ex.frow_ptr, f_score=ex.f_score, f_lm=ex.f_lm,
            f_ac=ex.f_ac, f_seq=ex.f_seq,
            seq_flat=seq_flat, seq_len=seq_len,
        )

    @classmethod
    def load_npz(cls, path: str, network: DecoderNetwork,
                 models: AcousticModelSet) -> "DecoderArtifact":
        """Restore a cached artifact. `network`/`models` must be the same
        resources the cache was built from (needed for the lazy traceback
        remainder DFS and downstream consumers)."""
        z = np.load(path)
        art = cls.__new__(cls)
        art.net = network
        art.models = models
        art.hmm_arc_ids = z["hmm_arc_ids"]
        art.n_hmm_arcs = len(art.hmm_arc_ids)
        art._global_to_hmm = np.full(network.n_arcs, -1, dtype=np.int64)
        art._global_to_hmm[art.hmm_arc_ids] = np.arange(art.n_hmm_arcs)
        art.arc_hmm = z["arc_hmm"]
        art.arc_weight = z["arc_weight"]
        art.arc_olabel = z["arc_olabel"]
        art.arc_dst = z["arc_dst"]
        art.trP = z["trP"]
        art.state_gmm = z["state_gmm"]
        art.hmm_n_states = z["hmm_n_states"]
        art.tee = z["tee"]
        art.S = art.trP.shape[1]
        seq_len = z["seq_len"]
        seq_off = np.concatenate([[0], np.cumsum(seq_len)])
        flat = z["seq_flat"]
        art.seqs = [
            tuple(int(x) for x in flat[seq_off[i]:seq_off[i + 1]])
            for i in range(len(seq_len))
        ]
        art._seq_index = {s: i for i, s in enumerate(art.seqs)}
        art._state_entries = {}
        art._state_finals = {}
        art._cum_entries = {}
        art._remainder_cache = {}
        art._fremainder_cache = {}
        art._max_entries = 100000
        art._native = None
        art.expansion = Expansion(
            row_ptr=z["row_ptr"], arc=z["ent_arc"], w_score=z["w_score"],
            w_lm=z["w_lm"], w_ac=z["w_ac"], seq=z["ent_seq"],
            frow_ptr=z["frow_ptr"], f_score=z["f_score"], f_lm=z["f_lm"],
            f_ac=z["f_ac"], f_seq=z["f_seq"],
        )
        return art

    # -- per-label crossing remainders (traceback word decomposition) --------

    def _closure_cums(self, state: int):
        """Like `_state_closure` but also records, per emitted label, the
        cumulative (lm, ac) weight at the moment that label's arc was
        crossed — the reference creates the word's Path record exactly
        there (`propagateToken`, WFSTDecoderLite.cpp:496-509 for word
        arcs; the eps branch adds the arc weight to the token BEFORE
        recursing, :530-536; the tee branch includes arc + tee weights,
        :580-595). Pure-python and lazy: only tracebacks need it, so the
        (possibly native-accelerated) build path stays untouched.

        Returns (entries, finals):
          entries: (hmm_arc, ws, wl, wa, seq, cums) with cums a tuple of
                   (cum_lm, cum_ac) per label in seq;
          finals:  (ws(+final), wl(+final), wa, seq, cums).
        """
        cached = self._cum_entries.get(state)
        if cached is not None:
            return cached

        net = self.net
        entries: list = []
        finals: list = []

        def visit(s, w_lm, w_ac, seq, cums, on_path):
            if len(entries) > self._max_entries:
                raise RuntimeError("eps/tee closure blow-up")
            fw = net.final_weight[s]
            if fw > LOG_ZERO:
                finals.append((w_lm + w_ac + fw, w_lm + fw, w_ac, seq, cums))
            for ai in net.arcs_from(s):
                il = int(net.arc_ilabel[ai])
                w = float(net.arc_weight[ai])
                ol = int(net.arc_olabel[ai])
                dst = int(net.arc_dst[ai])
                if il == 0:
                    nseq = seq + ((ol,) if ol != 0 else ())
                    ncums = cums + (((w_lm + w, w_ac),) if ol != 0 else ())
                    if dst in on_path:
                        continue
                    visit(dst, w_lm + w, w_ac, nseq, ncums, on_path | {dst})
                else:
                    hidx = int(self._global_to_hmm[ai])
                    entries.append(
                        (hidx, w_lm + w_ac + w, w_lm + w, w_ac, seq, cums)
                    )
                    tee = float(self.tee[il - 1])
                    if tee > LOG_ZERO:
                        nseq = seq + ((ol,) if ol != 0 else ())
                        ncums = cums + (
                            ((w_lm + w, w_ac + tee),) if ol != 0 else ()
                        )
                        if dst in on_path:
                            continue
                        visit(dst, w_lm + w, w_ac + tee, nseq, ncums,
                              on_path | {dst})

        visit(state, 0.0, 0.0, (), (), frozenset([state]))
        self._cum_entries[state] = (entries, finals)
        return entries, finals

    def _src_context(self, src_row: int):
        """(closure state, own-label count) for an expansion source row:
        an hmm-arc index, or n_hmm_arcs for the virtual start."""
        if src_row < 0 or src_row >= self.n_hmm_arcs:
            return int(self.net.init_state), 0
        own = 1 if int(self.arc_olabel[src_row]) != 0 else 0
        return int(self.arc_dst[src_row]), own

    def remainders(self, src_row: int, arc_b: int, seq_id: int):
        """Per-label (score, lm, ac) remainders for a path record that
        landed on hmm-arc `arc_b` with label sequence `seq_id`, expanded
        from source `src_row`. Subtracting remainder j from the record's
        landing values yields the reference's crossing-time Path values
        for label j. Returns a list of (rs, rl, ra), or None if no
        matching closure edge exists (shouldn't happen for engine-made
        records). Among parallel matching edges the best-score one wins,
        first-in-DFS-order on ties — exactly the engine's merge choice."""
        key = (src_row, arc_b, seq_id)
        hit = self._remainder_cache.get(key)
        if hit is not None:
            return hit
        state, n_own = self._src_context(src_row)
        labels = self.seqs[seq_id]
        closure_seq = tuple(labels[n_own:])
        best = None
        for (b, ws, wl, wa, seq, cums) in self._closure_cums(state)[0]:
            if b == arc_b and seq == closure_seq and (
                best is None or ws > best[0]
            ):
                best = (ws, wl, wa, cums)
        if best is None:
            self._remainder_cache[key] = None
            return None
        ws, wl, wa, cums = best
        out = [(ws, wl, wa)] * n_own  # own label crossed at the source exit
        out += [(ws - cl - ca, wl - cl, wa - ca) for (cl, ca) in cums]
        self._remainder_cache[key] = out
        return out

    def final_remainders(self, src_row: int, f_seq_id: int):
        """Like `remainders` for the final-reach segment: remainders are
        relative to the bestFinalToken values (which include the final
        weight — crossing-time Paths do not, so it stays in every
        remainder)."""
        key = (src_row, f_seq_id)
        hit = self._fremainder_cache.get(key)
        if hit is not None:
            return hit
        state, n_own = self._src_context(src_row)
        labels = self.seqs[f_seq_id]
        closure_seq = tuple(labels[n_own:])
        best = None
        for (ws, wl, wa, seq, cums) in self._closure_cums(state)[1]:
            if seq == closure_seq and (best is None or ws > best[0]):
                best = (ws, wl, wa, cums)
        if best is None:
            self._fremainder_cache[key] = None
            return None
        ws, wl, wa, cums = best
        out = [(ws, wl, wa)] * n_own
        out += [(ws - cl - ca, wl - cl, wa - ca) for (cl, ca) in cums]
        self._fremainder_cache[key] = out
        return out

    # -- anticipated output labels (OTF pushing) ----------------------------

    def anticipated_labels(self) -> np.ndarray:
        """Per hmm-arc anticipated output label for label-and-weight pushing
        (`WFSTLabelPushingNetwork::assignOutlabsToTrans`,
        `/root/reference/src/WFSTNetwork.cpp:1528+`), reduced to the decision
        that matters: the SINGLETON next output label of every path through
        the arc, or 0 when there is none / more than one.

        Fixpoint over the expansion tables: an arc with its own output label
        anticipates it; otherwise it anticipates the union of (first seq
        label or target arc's anticipation) over its closure entries,
        collapsed to 0 when non-singleton.
        """
        NONE, MULTI = 0, -1
        ex = self.expansion
        lab = np.where(self.arc_olabel != 0, self.arc_olabel, NONE).astype(np.int64)
        for _ in range(self.n_hmm_arcs + 2):
            changed = False
            for a in range(self.n_hmm_arcs):
                if lab[a] != NONE and self.arc_olabel[a] != 0:
                    continue
                got = set()
                for e in range(ex.row_ptr[a], ex.row_ptr[a + 1]):
                    seq = self.seqs[int(ex.seq[e])]
                    if seq:
                        got.add(int(seq[0]))
                    else:
                        t = lab[int(ex.arc[e])]
                        if t == MULTI:
                            got.add(-1)
                            got.add(-2)
                        elif t != NONE:
                            got.add(int(t))
                # final reach with no label pending also counts as "no word"
                if ex.frow_ptr[a] < ex.frow_ptr[a + 1]:
                    for e in range(ex.frow_ptr[a], ex.frow_ptr[a + 1]):
                        seq = self.seqs[int(ex.f_seq[e])]
                        got.add(int(seq[0]) if seq else 0)
                new = NONE
                got.discard(0)
                if len(got) == 1:
                    new = got.pop()
                elif len(got) > 1:
                    new = MULTI
                if new != lab[a]:
                    lab[a] = new
                    changed = True
            if not changed:
                break
        return np.where(lab > 0, lab, 0).astype(np.int32)

    # -- stats --------------------------------------------------------------

    @property
    def max_fanout(self) -> int:
        d = np.diff(self.expansion.row_ptr)
        return int(d.max(initial=0))

    def __repr__(self) -> str:
        return (
            f"DecoderArtifact(hmm_arcs={self.n_hmm_arcs}, S={self.S}, "
            f"entries={len(self.expansion.arc)}, max_fanout={self.max_fanout}, "
            f"seqs={len(self.seqs)})"
        )
