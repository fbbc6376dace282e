"""TPU decoder core: dense masked frontier Viterbi beam search.

The `WFSTDecoderLite` token-passing loop re-designed for XLA (SURVEY.md §7):

  - `NetInst` linked lists + BlockMemPool -> fixed-capacity frontier of K
    slots, each an active HMM arc with S padded token states; per-frame
    compaction by prefix-sum instead of pools;
  - `trans->hook` -> a dense arc->slot map rebuilt by scatter each frame;
  - within-HMM Viterbi (`HMMInternalPropagation`) -> batched masked
    max-plus over the padded (K, S, S) transition tensor with argmax
    gathers for the acoustic/LM/path payload;
  - GMM eval -> precomputed dense (T, n_gmms) score matrix (two MXU
    matmuls, see ops/gmm.py);
  - recursive eps/tee `propagateToken` -> precomputed per-arc expansion
    tables (see artifact.py) consumed by a fixed-budget gather +
    scatter-max segment reduction (hypothesis recombination);
  - histogram pruning (`Histogram::calcThresh`) -> exact k-th-best
    threshold via sort (strictly tighter than the reference's
    integer-binned approximation);
  - refcounted `Path` records + GC -> an append-only (T, K) traceback
    arena emitted from `lax.scan`; only merge-winning tokens write
    records, so the arena never needs collection.

The whole per-utterance decode is ONE `lax.scan` over frames inside jit.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .artifact import DecoderArtifact
from .ref_core import DecodeResult, WordHyp

NEG = -1.0e30


@dataclass
class TpuDecoderConfig:
    max_insts: int = 2048  # K
    expand_budget: int = 8192  # E: entry candidates per frame
    final_budget: int = 1024  # F: final-state candidates per frame
    phone_start_prune_win: float = 0.0
    emit_prune_win: float = 0.0
    phone_end_prune_win: float = 0.0
    word_prune_win: float = 0.0
    max_emit_hyps: int = 0
    dtype: str = "float32"


class TpuDecoder:
    def __init__(self, artifact: DecoderArtifact, config: Optional[TpuDecoderConfig] = None):
        self.art = artifact
        self.cfg = config or TpuDecoderConfig()
        cfg = self.cfg
        dt = jnp.float64 if cfg.dtype == "float64" else jnp.float32

        self._dt = dt
        self.K = cfg.max_insts
        self.E = cfg.expand_budget
        self.F = cfg.final_budget
        self.S = artifact.S
        self.n_arcs = artifact.n_hmm_arcs

        ex = artifact.expansion
        dev = {
            "arc_hmm": jnp.asarray(artifact.arc_hmm),
            "arc_olabel": jnp.asarray(artifact.arc_olabel),
            "trP": jnp.asarray(artifact.trP, dtype=dt),
            "state_gmm": jnp.asarray(artifact.state_gmm),
            "row_ptr": jnp.asarray(ex.row_ptr, dtype=jnp.int32),
            "ent_arc": jnp.asarray(ex.arc),
            "ent_ws": jnp.asarray(ex.w_score, dtype=dt),
            "ent_wlm": jnp.asarray(ex.w_lm, dtype=dt),
            "ent_wac": jnp.asarray(ex.w_ac, dtype=dt),
            "ent_seq": jnp.asarray(ex.seq),
            "frow_ptr": jnp.asarray(ex.frow_ptr, dtype=jnp.int32),
            "f_ws": jnp.asarray(ex.f_score, dtype=dt),
            "f_wlm": jnp.asarray(ex.f_lm, dtype=dt),
            "f_wac": jnp.asarray(ex.f_ac, dtype=dt),
            "f_seq": jnp.asarray(ex.f_seq),
        }
        # guard against empty tables (jnp indexing needs size >= 1)
        for k in ("ent_arc", "ent_ws", "ent_wlm", "ent_wac", "ent_seq"):
            if dev[k].shape[0] == 0:
                dev[k] = jnp.zeros(1, dev[k].dtype)
        for k in ("f_ws", "f_wlm", "f_wac", "f_seq"):
            if dev[k].shape[0] == 0:
                dev[k] = jnp.zeros(1, dev[k].dtype)
        self.dev = dev
        self._decode_jit = jax.jit(self._decode_scan)

    # ------------------------------------------------------------------
    # frontier helpers
    # ------------------------------------------------------------------

    def _empty_frontier(self):
        K, S = self.K, self.S
        dt = self._dt
        return {
            "arc": jnp.full((K,), -1, jnp.int32),
            "score": jnp.full((K, S), NEG, dt),
            "ac": jnp.full((K, S), NEG, dt),
            "lm": jnp.full((K, S), NEG, dt),
            "path": jnp.full((K, S), -1, jnp.int32),
        }

    def _expand(self, src_score, src_ac, src_lm, src_path, src_arcrow, live):
        """Fixed-budget expansion of exiting tokens through the closure
        tables. src_* are (K,) token fields; src_arcrow is the CSR row
        (hmm-arc index, or n_arcs for the virtual start source)."""
        dev = self.dev
        K, E = src_score.shape[0], self.E
        fan = (dev["row_ptr"][src_arcrow + 1] - dev["row_ptr"][src_arcrow]) * live
        offs = jnp.cumsum(fan) - fan  # start offset per source
        total = offs[-1] + fan[-1]
        e_idx = jnp.arange(E, dtype=jnp.int32)
        src_k = jnp.searchsorted(offs + fan, e_idx, side="right").astype(jnp.int32)
        src_k = jnp.minimum(src_k, K - 1)
        within = e_idx - offs[src_k]
        valid = (e_idx < total) & (within < fan[src_k])
        ent = dev["row_ptr"][src_arcrow[src_k]] + within
        ent = jnp.clip(ent, 0, dev["ent_arc"].shape[0] - 1)
        cand_arc = jnp.where(valid, dev["ent_arc"][ent], 0)
        cand_score = jnp.where(valid, src_score[src_k] + dev["ent_ws"][ent], NEG)
        cand_ac = src_ac[src_k] + dev["ent_wac"][ent]
        cand_lm = src_lm[src_k] + dev["ent_wlm"][ent]
        cand_prev = src_path[src_k]
        cand_seq = dev["ent_seq"][ent]
        overflow = total > E
        return dict(
            arc=cand_arc, score=cand_score, ac=cand_ac, lm=cand_lm,
            prev=cand_prev, seq=cand_seq, valid=valid & (cand_score > NEG / 2),
            overflow=overflow,
        )

    def _expand_finals(self, src_score, src_ac, src_lm, src_path, src_arcrow, live, best):
        """Final-state candidates (bestFinalToken updates)."""
        dev = self.dev
        K, F = src_score.shape[0], self.F
        fan = (dev["frow_ptr"][src_arcrow + 1] - dev["frow_ptr"][src_arcrow]) * live
        offs = jnp.cumsum(fan) - fan
        total = offs[-1] + fan[-1]
        e_idx = jnp.arange(F, dtype=jnp.int32)
        src_k = jnp.searchsorted(offs + fan, e_idx, side="right").astype(jnp.int32)
        src_k = jnp.minimum(src_k, K - 1)
        within = e_idx - offs[src_k]
        valid = (e_idx < total) & (within < fan[src_k])
        ent = dev["frow_ptr"][src_arcrow[src_k]] + within
        ent = jnp.clip(ent, 0, dev["f_ws"].shape[0] - 1)
        sc = jnp.where(valid, src_score[src_k] + dev["f_ws"][ent], NEG)
        i = jnp.argmax(sc)
        better = sc[i] > best["score"]
        new = {
            "score": jnp.where(better, sc[i], best["score"]),
            "ac": jnp.where(better, src_ac[src_k[i]] + dev["f_wac"][ent[i]], best["ac"]),
            "lm": jnp.where(better, src_lm[src_k[i]] + dev["f_wlm"][ent[i]], best["lm"]),
            "path": jnp.where(better, src_path[src_k[i]], best["path"]),
            "seq": jnp.where(better, dev["f_seq"][ent[i]], best["seq"]),
        }
        return new, total > F

    def _merge_and_insert(self, fr, cand, t):
        """Segment-max recombination of candidates by target arc, merge into
        live slots or allocate new ones, emit traceback records."""
        K, S = self.K, self.S
        dt = self._dt

        # liveness of existing insts: any token in states 0..S-2
        live_tok = fr["score"][:, : S - 1] > NEG / 2
        live = jnp.any(live_tok, axis=1) & (fr["arc"] >= 0)

        # compact old slots to the front
        order = jnp.argsort(~live, stable=True)  # live first, stable
        fr = {k: v[order] for k, v in fr.items()}
        n_live = jnp.sum(live.astype(jnp.int32))

        # dense arc -> slot map (out-of-bounds index drops the write)
        slot_ids = jnp.arange(K, dtype=jnp.int32)
        arc_idx = jnp.where(fr["arc"] >= 0, fr["arc"], self.n_arcs)
        arc_slot = jnp.full((self.n_arcs,), -1, jnp.int32).at[arc_idx].set(
            slot_ids, mode="drop"
        )

        # segment-max by candidate target arc
        seg_best = jnp.full((self.n_arcs,), NEG, dt).at[cand["arc"]].max(
            jnp.where(cand["valid"], cand["score"], NEG), mode="drop"
        )
        is_best = cand["valid"] & (cand["score"] >= seg_best[cand["arc"]] - 0.0)
        big = jnp.int32(2**30)
        e_ids = jnp.arange(self.E, dtype=jnp.int32)
        seg_first = jnp.full((self.n_arcs,), big, jnp.int32).at[cand["arc"]].min(
            jnp.where(is_best, e_ids, big), mode="drop"
        )
        winner = is_best & (e_ids == seg_first[cand["arc"]])

        # slot allocation: winners write their entry token into a slot
        tgt_slot = arc_slot[cand["arc"]]
        need_new = winner & (tgt_slot < 0)
        new_pos = jnp.cumsum(need_new.astype(jnp.int32)) - 1
        alloc = n_live + new_pos
        overflow = jnp.any(need_new & (alloc >= K))
        slot = jnp.where(need_new, alloc, tgt_slot)
        w_ok = winner & (slot >= 0) & (slot < K)
        # non-winning candidates get an out-of-bounds index so every scatter
        # below silently drops them (mode="drop")
        slot_w = jnp.where(w_ok, slot, K)

        # clear stale rows beyond the live prefix before inserting new arcs
        stale = jnp.arange(K) >= n_live
        arc_new = jnp.where(stale, -1, fr["arc"])
        score = jnp.where(stale[:, None], NEG, fr["score"])
        ac = jnp.where(stale[:, None], NEG, fr["ac"])
        lm = jnp.where(stale[:, None], NEG, fr["lm"])
        path = jnp.where(stale[:, None], -1, fr["path"])

        arc_new = arc_new.at[slot_w].set(cand["arc"], mode="drop")

        # entry-token merge (states[0]); at most one winner per arc and the
        # entry state is null after internal propagation, so plain set is the
        # max-merge
        rec_id = (t * K + slot_w).astype(jnp.int32)
        has_seq = cand["seq"] != 0
        entry_path = jnp.where(has_seq, rec_id, cand["prev"])
        score = score.at[slot_w, 0].set(cand["score"], mode="drop")
        ac = ac.at[slot_w, 0].set(cand["ac"], mode="drop")
        lm = lm.at[slot_w, 0].set(cand["lm"], mode="drop")
        path = path.at[slot_w, 0].set(entry_path, mode="drop")

        # traceback records (one per winning entry with a non-empty label seq)
        slot_rec = jnp.where(w_ok & has_seq, slot, K)
        rec = {
            "prev": jnp.full((K,), -1, jnp.int32).at[slot_rec].set(cand["prev"], mode="drop"),
            "seq": jnp.full((K,), 0, jnp.int32).at[slot_rec].set(cand["seq"], mode="drop"),
            "score": jnp.full((K,), NEG, dt).at[slot_rec].set(cand["score"], mode="drop"),
            "ac": jnp.full((K,), NEG, dt).at[slot_rec].set(cand["ac"], mode="drop"),
            "lm": jnp.full((K,), NEG, dt).at[slot_rec].set(cand["lm"], mode="drop"),
        }

        best_new = jnp.max(jnp.where(winner, cand["score"], NEG))
        fr_new = {"arc": arc_new, "score": score, "ac": ac, "lm": lm, "path": path}
        return fr_new, rec, best_new, overflow

    # ------------------------------------------------------------------
    # per-frame step
    # ------------------------------------------------------------------

    def _frame_step(self, carry, frame_in):
        cfg = self.cfg
        dev = self.dev
        K, S = self.K, self.S
        dt = self._dt
        gmm_t, t = frame_in["gmm"], frame_in["t"]
        fr = carry["fr"]

        normalise = jnp.where(carry["best_emit"] > NEG / 2, carry["best_emit"], 0.0).astype(dt)

        # emit threshold (histogram/top-k ∧ main beam)
        if cfg.max_emit_hyps > 0:
            thresh = carry["kth_emit"] - normalise
            if cfg.emit_prune_win > 0.0:
                thresh = jnp.maximum(thresh, -cfg.emit_prune_win)
            emit_thresh = thresh
        else:
            emit_thresh = jnp.asarray(
                -cfg.emit_prune_win if cfg.emit_prune_win > 0.0 else NEG, dt
            )
        start_thresh = (
            carry["best_start"] - cfg.phone_start_prune_win
            if cfg.phone_start_prune_win > 0.0
            else jnp.asarray(NEG, dt)
        )

        # ---- internal propagation ----------------------------------------
        # entry-state LM pruning
        entry = fr["score"][:, 0]
        fr["score"] = fr["score"].at[:, 0].set(jnp.where(entry < start_thresh, NEG, entry))

        hmm = jnp.where(fr["arc"] >= 0, dev["arc_hmm"][jnp.maximum(fr["arc"], 0)], 0)
        trP = dev["trP"][hmm]  # (K, S, S)

        # emitting states: j in 1..S-2
        m = fr["score"][:, :, None] + trP  # (K, i, j)
        best_i = jnp.argmax(m, axis=1)  # (K, j)
        new_score = jnp.take_along_axis(m, best_i[:, None, :], axis=1)[:, 0, :]
        k_ids = jnp.arange(K)[:, None]
        gi = best_i  # (K, j)
        step_w = jnp.take_along_axis(trP, gi[:, None, :], axis=1)[:, 0, :]
        new_ac = fr["ac"][k_ids, gi] + step_w
        new_lm = fr["lm"][k_ids, gi]
        new_path = fr["path"][k_ids, gi]

        sg = dev["state_gmm"][hmm]  # (K, S)
        emitting = sg >= 0
        outp = gmm_t[jnp.maximum(sg, 0)]  # (K, S)
        ns = new_score - normalise
        pass_emit = emitting & (ns > emit_thresh) & (new_score > NEG / 2)
        e_score = jnp.where(pass_emit, ns + outp, NEG)
        e_ac = jnp.where(pass_emit, new_ac + outp, NEG)
        e_lm = jnp.where(pass_emit, new_lm, NEG)
        e_path = jnp.where(pass_emit, new_path, -1)

        best_emit = jnp.max(jnp.where(pass_emit, e_score, NEG))
        if cfg.max_emit_hyps > 0:
            flat = jnp.where(pass_emit, e_score, NEG).reshape(-1)
            kth = jax.lax.top_k(flat, cfg.max_emit_hyps)[0][-1]
            kth_emit = jnp.where(kth > NEG / 2, kth, NEG)
        else:
            kth_emit = jnp.asarray(NEG, dt)

        # write back emitting tokens (entry becomes null)
        score2 = jnp.where(emitting, e_score, NEG)
        ac2 = jnp.where(emitting, e_ac, NEG)
        lm2 = jnp.where(emitting, e_lm, NEG)
        path2 = jnp.where(emitting, e_path, -1)

        # exit state: max over emitting j of new emitting score + trP[j, S-1]
        exit_cand = jnp.where(emitting, score2, NEG) + trP[:, :, S - 1]
        j_best = jnp.argmax(exit_cand, axis=1)
        kk = jnp.arange(K)
        exit_score = exit_cand[kk, j_best]
        exit_ok = exit_score > NEG / 2
        exit_score = jnp.where(exit_ok, exit_score, NEG)
        exit_ac = jnp.where(exit_ok, ac2[kk, j_best] + trP[kk, j_best, S - 1], NEG)
        exit_lm = jnp.where(exit_ok, lm2[kk, j_best], NEG)
        exit_path = jnp.where(exit_ok, path2[kk, j_best], -1)
        best_end = jnp.max(exit_score)

        fr = {
            "arc": fr["arc"],
            "score": score2,
            "ac": ac2,
            "lm": lm2,
            "path": path2,
        }

        # ---- external propagation ----------------------------------------
        end_thresh = (
            best_end - cfg.phone_end_prune_win
            if cfg.phone_end_prune_win > 0.0
            else jnp.asarray(NEG, dt)
        )
        word_thresh = (
            best_end - cfg.word_prune_win if cfg.word_prune_win > 0.0 else jnp.asarray(NEG, dt)
        )
        arc_ol = jnp.where(fr["arc"] >= 0, dev["arc_olabel"][jnp.maximum(fr["arc"], 0)], 0)
        thresh_k = jnp.where(arc_ol == 0, end_thresh, word_thresh)
        live_exit = exit_ok & (exit_score > thresh_k) & (fr["arc"] >= 0)

        src_row = jnp.where(fr["arc"] >= 0, fr["arc"], 0)
        cand = self._expand(exit_score, exit_ac, exit_lm, exit_path, src_row, live_exit)
        best_final, f_overflow = self._expand_finals(
            exit_score, exit_ac, exit_lm, exit_path, src_row, live_exit,
            {"score": jnp.asarray(NEG, dt), "ac": jnp.asarray(NEG, dt),
             "lm": jnp.asarray(NEG, dt), "path": jnp.int32(-1), "seq": jnp.int32(0)},
        )

        fr, rec, best_entry, m_overflow = self._merge_and_insert(fr, cand, t)

        best_emit = jnp.maximum(best_emit, best_entry)
        best_start = best_entry

        carry_new = {
            "fr": fr,
            "best_emit": best_emit,
            "best_start": best_start,
            "kth_emit": kth_emit,
            "best_final": best_final,
            "overflow": carry["overflow"] | cand["overflow"] | m_overflow | f_overflow,
        }
        ys = {
            "rec_prev": rec["prev"],
            "rec_seq": rec["seq"],
            "rec_score": rec["score"],
            "rec_ac": rec["ac"],
            "rec_lm": rec["lm"],
        }
        return carry_new, ys

    # ------------------------------------------------------------------
    # full decode
    # ------------------------------------------------------------------

    def _init_carry(self):
        dt = self._dt
        fr = self._empty_frontier()
        # initial propagation: virtual start row (index n_arcs), token 0.0
        K = self.K
        src_score = jnp.full((K,), NEG, dt).at[0].set(0.0)
        src_zero = jnp.zeros((K,), dt)
        src_path = jnp.full((K,), -1, jnp.int32)
        src_row = jnp.full((K,), self.n_arcs, jnp.int32)
        live = jnp.zeros((K,), bool).at[0].set(True)
        cand = self._expand(src_score, src_zero, src_zero, src_path, src_row, live)
        best_final, f_ov = self._expand_finals(
            src_score, src_zero, src_zero, src_path, src_row, live,
            {"score": jnp.asarray(NEG, dt), "ac": jnp.asarray(NEG, dt),
             "lm": jnp.asarray(NEG, dt), "path": jnp.int32(-1), "seq": jnp.int32(0)},
        )
        fr, rec0, best_entry, m_ov = self._merge_and_insert(fr, cand, -1)
        carry = {
            "fr": fr,
            "best_emit": jnp.asarray(NEG, dt),
            "best_start": best_entry,
            "kth_emit": jnp.asarray(NEG, dt),
            "best_final": best_final,
            "overflow": cand["overflow"] | m_ov | f_ov,
        }
        return carry, rec0

    def _decode_scan(self, gmm_scores):
        T = gmm_scores.shape[0]
        carry, rec0 = self._init_carry()
        frame_in = {"gmm": gmm_scores, "t": jnp.arange(T, dtype=jnp.int32)}
        carry, ys = jax.lax.scan(self._frame_step, carry, frame_in)
        return carry, ys, rec0

    def decode_scores(self, gmm_scores: np.ndarray) -> DecodeResult:
        """Decode from a precomputed (T, n_gmms) log-likelihood matrix."""
        gmm_scores = jnp.asarray(gmm_scores, dtype=self._dt)
        carry, ys, rec0 = self._decode_jit(gmm_scores)
        return self._traceback(carry, ys, rec0, int(gmm_scores.shape[0]))

    def decode_features(self, features: np.ndarray, scorer) -> DecodeResult:
        """Decode raw features with a (T, D) -> (T, n_gmms) scorer."""
        return self.decode_scores(np.asarray(scorer(jnp.asarray(features))))

    # ------------------------------------------------------------------
    # traceback (host)
    # ------------------------------------------------------------------

    def _traceback(self, carry, ys, rec0, T) -> DecodeResult:
        bf = jax.tree.map(np.asarray, carry["best_final"])
        if bool(np.asarray(carry["overflow"])):
            import warnings

            warnings.warn("TpuDecoder: expansion/frontier budget overflow; results may be pruned")
        score = float(bf["score"])
        if score <= NEG / 2:
            return DecodeResult([], [], NEG, NEG, NEG, T)
        rec_prev = np.asarray(ys["rec_prev"]).reshape(-1)
        rec_seq = np.asarray(ys["rec_seq"]).reshape(-1)
        rec_score = np.asarray(ys["rec_score"]).reshape(-1)
        rec_ac = np.asarray(ys["rec_ac"]).reshape(-1)
        rec_lm = np.asarray(ys["rec_lm"]).reshape(-1)
        r0 = {k: np.asarray(v) for k, v in rec0.items()}
        K = self.K
        seqs = self.art.seqs

        def rec_fields(pid):
            if pid >= 0:
                return (
                    int(rec_prev[pid]), int(rec_seq[pid]), float(rec_score[pid]),
                    float(rec_ac[pid]), float(rec_lm[pid]), pid // K,
                )
            slot = pid + K  # init records encoded as t=-1 -> pid in [-K, 0)
            return (
                int(r0["prev"][slot]), int(r0["seq"][slot]), float(r0["score"][slot]),
                float(r0["ac"][slot]), float(r0["lm"][slot]), -1,
            )

        hyps: list[WordHyp] = []
        # final token's own label sequence
        fseq = seqs[int(bf["seq"])]
        for lab in reversed(fseq):
            hyps.append(WordHyp(lab, T - 1, score, float(bf["ac"]), float(bf["lm"])))
        pid = int(bf["path"])
        first = not fseq
        while pid != -1:
            prev, seq_id, s, a, l, frame = rec_fields(pid)
            labs = seqs[seq_id]
            if first:
                s, a, l = score, float(bf["ac"]), float(bf["lm"])
                first = False
            for lab in reversed(labs):
                hyps.append(WordHyp(lab, frame, s, a, l))
            pid = prev
        hyps.reverse()
        return DecodeResult(
            words=[h.word for h in hyps],
            word_hyps=hyps,
            score=score,
            acoustic_score=float(bf["ac"]),
            lm_score=float(bf["lm"]),
            n_frames=T,
        )
