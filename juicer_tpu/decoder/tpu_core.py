"""TPU decoder core: dense masked frontier Viterbi beam search.

The `WFSTDecoderLite` token-passing loop re-designed for XLA (SURVEY.md §7):

  - `NetInst` linked lists + BlockMemPool -> fixed-capacity frontier of K
    slots, each an active HMM arc with S padded token states, kept SORTED
    BY ARC ID so that hypothesis recombination can look up live slots with
    a dense vectorized binary search instead of a scattered hash
    (`trans->hook` in the reference);
  - within-HMM Viterbi (`HMMInternalPropagation`) -> batched masked
    max-plus over the padded (K, S, S) transition tensor with one-hot
    payload selection;
  - GMM eval -> precomputed dense (T, n_gmms) score matrix (two MXU
    matmuls, see ops/gmm.py);
  - recursive eps/tee `propagateToken` -> precomputed per-arc expansion
    tables (see artifact.py) consumed by a fixed-budget gather;
  - hypothesis recombination -> per-(arc)-group argmax via a dense (E, E)
    boolean compare at original candidate positions (payloads never move;
    no bitonic network in the frame step at all);
  - histogram pruning (`Histogram::calcThresh`) -> the reference's
    integer-binned threshold reproduced exactly as one fused
    compare-reduce (default, `histogram_mode="binned"`); an exact
    k-th-best top_k variant (strictly tighter) as the TPU-native
    option;
  - refcounted `Path` records + GC -> an append-only (T, K) traceback
    arena emitted from `lax.scan`; only merge-winning tokens write
    records, so the arena never needs collection.

TPU performance rules baked in (profiled on v5e):
  - arbitrary-index gathers/scatters serialize per *index*; every lookup is
    either a single packed row-gather, a one-hot MXU matmul (exact: one-hot
    rows have a single 1), a dense vectorized searchsorted (compare_all),
    or a dense boolean compare matrix reduced in place;
  - the only scatter left is the unique-index packed winner insertion.

The whole per-utterance decode is ONE `lax.scan` over frames inside jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .artifact import DecoderArtifact
from .ref_core import DecodeResult, WordHyp

NEG = -1.0e30


def _segment_broadcast(rows, offs, valid_src, out_len):
    """Scatter row k of `rows` (K, C) at position offs[k] (unique, ascending
    for valid sources), then forward-fill so every position in [offs[k],
    offs[k+1]) carries row k. Returns (out (out_len, C), filled (out_len,))."""
    K, C = rows.shape
    idx = jnp.where(valid_src, offs, out_len)  # invalid -> dropped
    # single scatter: the valid mark rides as an extra column. (A cummax-
    # over-source-index + row-gather variant measured ~equal runtime but
    # 3x the compile time on TPU; the payload-carrying scan is kept.)
    rows_m = jnp.concatenate([rows, jnp.ones((K, 1), rows.dtype)], axis=1)
    out = jnp.zeros((out_len, C + 1), rows.dtype).at[idx].set(
        rows_m, mode="drop", unique_indices=True
    )

    def combine(a, b):
        return jnp.where(b[..., -1:] > 0.5, b, a)

    out = jax.lax.associative_scan(combine, out, axis=0)
    return out[:, :C], out[:, -1] > 0.5


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
    # -maxHyps semantics: "binned" reproduces the reference's integer-
    # binned `Histogram::calcThresh` threshold exactly (default — parity
    # with the reference's most effective pruning mode); "exact" uses the
    # true k-th-best score (strictly tighter, TPU-native option)
    histogram_mode: str = "binned"
    # recombination strategy: "dense" = (E, E) boolean segment-max + (E, K)
    # slot routing at original positions (fastest at small budgets, but the
    # compare matrices are quadratic in E/K); "sort" = one (K+E)-row
    # multi-operand stable co-sort (O((K+E) log^2) — the only viable shape
    # at WSJ-order budgets); "auto" picks by budget size
    merge_strategy: str = "auto"
    dtype: str = "float32"
    gen_lattice: bool = False
    # frame-loop unroll factor for the decode lax.scan: amortizes the
    # per-frame dispatch/fusion-boundary overhead of the ~60-op step.
    # Results are EXACT (pure loop restructuring). Measured at the bench
    # operating point (B=128, K=E=128): 1 -> 173k, 2 -> 220k, 4 -> 249k,
    # 8 -> 266k, 16 -> 287k frames/s (PERF.md §4). 0 = auto: 8 on
    # accelerators at small budgets; 1 on CPU (test compile time) and at
    # WSJ-order budgets (the unrolled graph would multiply the already-
    # long compile).
    scan_unroll: int = 0
    # per-frame best-final snapshots (exact padded decoding) + active-inst
    # counters; disable to shrink the compiled scan (benchmarks)
    emit_diagnostics: bool = True
    # OTF label-and-weight pushing: apply the G weight of an arc's
    # anticipated (singleton) output label at entry and compensate at exit,
    # so LM information participates in pruning early
    otf_pushing: bool = False
    # device-table binding for the jitted decode scan. "args" passes the
    # table pytree as plain jit arguments (mandatory at WSJ scale: multi-GB
    # closed-over constants ride through every (re)lowering and make
    # autotune probe compiles pathologically slow). "const" closes over
    # them as lowering-time constants (faster dispatch + constant folding
    # at toy/bench table sizes — the r4 all-args change cost 8% on the
    # small-budget bench, PERF.md R5.1). "auto" picks by total table bytes.
    tables_as_args: str = "auto"


class TpuDecoder:
    """Static-network decoder; pass `g_network` for on-the-fly composition
    (frontier keyed by (CL arc, G state) pairs, word labels intersected
    with the sorted G during expansion — the `WFSTOnTheFlyDecoder`
    equivalent)."""

    def __init__(
        self,
        artifact: DecoderArtifact,
        config: Optional[TpuDecoderConfig] = None,
        g_network=None,
    ):
        self.art = artifact
        self.cfg = config or TpuDecoderConfig()
        self.g = g_network
        self.otf = g_network is not None
        cfg = self.cfg
        dt = jnp.float64 if cfg.dtype == "float64" else jnp.float32

        self._dt = dt

        def _rup(x, m=128):
            return max(m, ((int(x) + m - 1) // m) * m)

        # budgets never need to exceed the network itself: at most n_hmm_arcs
        # insts can be live (x |G| in OTF mode, where slots are (arc, g)
        # pairs), and one frame can expand at most every closure entry once
        # — except in OTF, where the SAME arc can exit from several G
        # states in one frame, so the bound is K x max fanout instead
        n_entries = len(artifact.expansion.arc)
        n_fentries = len(artifact.expansion.f_score)
        if self.otf:
            k_cap = _rup(artifact.n_hmm_arcs * max(g_network.n_states, 1) + 1)
            self.K = min(cfg.max_insts, k_cap)
            fan = np.diff(artifact.expansion.row_ptr).max(initial=0)
            ffan = np.diff(artifact.expansion.frow_ptr).max(initial=0)
            self.E = min(cfg.expand_budget, _rup(self.K * max(fan, 1) + 1))
            self.F = min(cfg.final_budget, _rup(self.K * max(ffan, 1) + 1))
        else:
            self.K = min(cfg.max_insts, _rup(artifact.n_hmm_arcs + 1))
            self.E = min(cfg.expand_budget, _rup(n_entries + 1))
            self.F = min(cfg.final_budget, _rup(n_fentries + 1))
        self.S = artifact.S
        self.n_arcs = artifact.n_hmm_arcs
        self.H = artifact.trP.shape[0]

        if cfg.dtype == "float32" and (
            self.n_arcs >= (1 << 24) or len(artifact.seqs) >= (1 << 24)
        ):
            raise ValueError("network too large for f32 packed tables; use float64")

        # Entry-table BASES exceed 2^24 at WSJ scale (213M closure entries)
        # and stop being exactly representable in the f32 expansion payload;
        # there they ride split into 4096-sized hi/lo halves. Below 2^24
        # (every toy/midsize task) the single-column form is exact and one
        # payload column cheaper (part of the r4 toy-bench regression fix,
        # PERF.md R5.1).
        self._base_split = dt == jnp.float32 and (
            n_entries >= (1 << 24) or n_fentries >= (1 << 24)
        )


        ex = artifact.expansion

        # --- config-independent device tables are cached ON THE ARTIFACT:
        # at WSJ scale ent_pack alone is multi-GB, and rebuilding a
        # TpuDecoder (autotune probes, diagnostics on/off, dtype-matched
        # oracles) must not re-upload it per instance
        cache_key = str(dt)
        dev_cache = getattr(artifact, "_dev_cache", None)
        if dev_cache is None:
            dev_cache = artifact._dev_cache = {}
        static = dev_cache.get(cache_key)
        if static is None:
            # --- per-arc metadata: ONE row-gather per frontier slot -------
            # rows: [hmm, olabel, ent_base, ent_fan, f_base, f_fan];
            # index n_arcs = virtual start source, n_arcs+1 = dead sentinel
            ent_base = np.asarray(ex.row_ptr[:-1], np.float64)
            ent_fan = np.diff(ex.row_ptr).astype(np.float64)
            f_base = np.asarray(ex.frow_ptr[:-1], np.float64)
            f_fan = np.diff(ex.frow_ptr).astype(np.float64)
            hmm_col = np.concatenate([artifact.arc_hmm.astype(np.float64), [0.0]])
            ol_col = np.concatenate([artifact.arc_olabel.astype(np.float64), [0.0]])
            arc_meta = np.stack(
                [hmm_col, ol_col, ent_base, ent_fan, f_base, f_fan], axis=1
            )
            arc_meta = np.concatenate([arc_meta, np.zeros((1, 6))], axis=0)

            # --- expansion entry tables packed for single row-gathers -----
            n_ent = max(len(ex.w_score), 1)
            ent_pack = np.zeros((n_ent, 5))
            if len(ex.w_score):
                ent_pack[:, 0] = ex.arc
                ent_pack[:, 1] = ex.w_score
                ent_pack[:, 2] = ex.w_lm
                ent_pack[:, 3] = ex.w_ac
                ent_pack[:, 4] = ex.seq
            f_pack = np.zeros((max(len(ex.f_score), 1), 4))
            if len(ex.f_score):
                f_pack[:, 0] = ex.f_score
                f_pack[:, 1] = ex.f_lm
                f_pack[:, 2] = ex.f_ac
                f_pack[:, 3] = ex.f_seq
            static = {
                # arc_meta is INTEGER data (hmm, olabel, CSR bases/fans):
                # kept int32 so entry-table offsets stay exact past 2^24
                # (a WSJ-scale closure has >200M entries; carrying bases
                # in f32 silently rounded them to multiples of 16 and
                # gathered the wrong closure entries — caught by the
                # reference-scale parity check, round 4)
                "arc_meta": jnp.asarray(arc_meta, dtype=np.int32),
                "ent_pack": jnp.asarray(ent_pack, dtype=dt),
                "f_pack": jnp.asarray(f_pack, dtype=dt),
            }
            dev_cache[cache_key] = static

        self.dev = {
            "arc_meta": static["arc_meta"],  # (n_arcs+2, 6)
            "trP_flat": jnp.asarray(
                artifact.trP.reshape(self.H, -1), dtype=dt
            ),  # (H, S*S)
            "sg_mask": jnp.asarray(
                (artifact.state_gmm >= 0).astype(np.float32), dtype=dt
            ),  # (H, S)
            "state_gmm": jnp.asarray(np.maximum(artifact.state_gmm, 0)),  # (H, S)
            "ent_pack": static["ent_pack"],  # (n_ent, 5)
            "f_pack": static["f_pack"],  # (n_fent, 4)
        }

        if self.otf:
            g = self.g
            # padded per-seq word arrays for G intersection
            Lmax = max((len(s) for s in artifact.seqs), default=1)
            self.seq_len = max(Lmax, 1)
            seq_words = np.zeros((len(artifact.seqs), self.seq_len), np.int32)
            for i, s in enumerate(artifact.seqs):
                seq_words[i, : len(s)] = s
            self.nG = g.n_states
            # ONE packed row per G state: [il(R) | dst(R) | w(R) | bo_dst |
            # bo_w | dense_idx]. The per-level advance then costs a single
            # (N, 3R+3) packed row-gather instead of five separate gathers
            # (pad_il/pad_dst/pad_w/bo_dst/bo_w/dense_idx) — ids are exact
            # in f32 below 2^24, which the packed tables already require.
            R = g.pad_R
            row_pack = np.concatenate(
                [
                    g.pad_il.astype(np.float64),
                    g.pad_dst.astype(np.float64),
                    g.pad_w,
                    g.bo_dst.astype(np.float64)[:, None],
                    g.bo_w[:, None],
                    g.dense_idx.astype(np.float64)[:, None],
                ],
                axis=1,
            )
            self.dev.update(
                {
                    "seq_words": jnp.asarray(seq_words),
                    "g_row_pack": jnp.asarray(row_pack, dtype=dt),
                    "g_dense_dst_flat": jnp.asarray(g.dense_dst.reshape(-1)),
                    "g_dense_w_flat": jnp.asarray(
                        g.dense_w.reshape(-1), dtype=dt
                    ),
                    "g_freach": jnp.asarray(g.final_reach, dtype=dt),
                }
            )
            self._g_R = g.pad_R
            self._g_W = g.W
            self._g_maxbo = g.max_backoff
            self.pushing = cfg.otf_pushing
            if self.pushing:
                # anticipated singleton output label per arc (0 = none/multi)
                push = artifact.anticipated_labels()
                self.dev["push_label"] = jnp.asarray(
                    np.concatenate([push, [0, 0]])
                )
        else:
            self.pushing = False
        if cfg.histogram_mode not in ("binned", "exact"):
            raise ValueError(f"unknown histogram_mode {cfg.histogram_mode!r}")
        if cfg.max_emit_hyps > 0 and cfg.histogram_mode == "binned":
            # reference histogram bounds (`WFSTDecoderLite.cpp:78-80`,
            # widened by one each side in `Histogram.cpp:28-30`)
            lo = -cfg.emit_prune_win - 800.0 if cfg.emit_prune_win > 0.0 else -1000.0
            self._hist_min = float(int(lo - 1.0))
            self._hist_max = float(int(200.0 + 1.0))
        ms = cfg.merge_strategy
        if ms == "auto":
            # dense wins at EVERY measured size on TPU (PERF.md §3): the
            # quadratic (E, E)+(E, K) compares stream at HBM bandwidth
            # while the (K+E)-row variadic bitonic co-sort pays large
            # per-operand constants (A/B at K=8192/E=32768: dense ~4.5x
            # faster). Fall back to sort only where the dense compare
            # matrices stop being practical.
            ms = "sort" if self.E > 32768 else "dense"
        if ms not in ("dense", "sort"):
            raise ValueError(f"unknown merge_strategy {cfg.merge_strategy!r}")
        self.merge_strategy = ms
        # auto unroll (accelerators): 8 at toy budgets; 4 at certified
        # WSJ-order operating points (K<=2048/E<=2048 — measured +17% at
        # K=1536/E=1920 and the 102.8x-RT point K=1024/E=1408, PERF.md
        # R4.3b); 1 above that (big-budget steps are memory-bound and the
        # unrolled graph multiplies an already-long compile, PERF.md §4)
        # and on CPU (test compile time).
        if cfg.scan_unroll:
            self.scan_unroll = cfg.scan_unroll
        elif jax.default_backend() == "cpu":
            self.scan_unroll = 1
        elif self.K <= 512 and self.E <= 1024:
            self.scan_unroll = 8
        elif self.K <= 2048 and self.E <= 2048:
            self.scan_unroll = 4
        else:
            self.scan_unroll = 1
        # Device-table binding (cfg.tables_as_args). Large tables are
        # passed as jit ARGUMENTS: closed-over arrays are captured as
        # lowering-time constants, and at WSJ scale the multi-GB entry
        # table makes every (re)compile haul them through the lowering
        # pipeline. Small tables are CLOSED OVER: constants enable folding
        # and skip per-dispatch argument handling (the r4 all-args change
        # cost 8% on the toy bench — A/B in PERF.md R5.1). "auto" switches
        # at 128 MB total.
        taa = cfg.tables_as_args
        if taa == "auto":
            nbytes = sum(v.size * v.dtype.itemsize for v in self.dev.values())
            # OTF always uses args: XLA constant-folds reduce-windows over
            # the closed-over padded G rows (>8s/instruction at 2k words)
            taa = ("args" if self.otf or nbytes > (128 << 20) else "const")
        if taa not in ("args", "const"):
            raise ValueError(f"unknown tables_as_args {cfg.tables_as_args!r}")
        self.tables_as_args = taa
        if taa == "args":
            def _scan_with_dev(dev, gmm_scores):
                saved = self.dev
                self.dev = dev
                try:
                    return self._decode_scan(gmm_scores)
                finally:
                    self.dev = saved

            jit_scan = jax.jit(_scan_with_dev)
            self._decode_jit = lambda scores: jit_scan(self.dev, scores)
        else:
            self._decode_jit = jax.jit(self._decode_scan)

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _onehot_matmul(self, idx, n, table):
        """Exact gather-as-matmul: rows of one-hot(idx) @ table."""
        oh = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]).astype(self._dt)
        return jnp.dot(oh, table, preferred_element_type=self._dt,
                       precision=jax.lax.Precision.HIGHEST)

    def _g_advance(self, g, words_valid, word):
        """Vectorized G advance: consume `word` from state `g` via
        match-or-backoff. Inputs (N,); returns (g', weight_delta, ok).

        Per backoff level: ONE packed row-gather of the state's padded
        sorted arc row (GNetwork.pad_il, (nG, R)) + a dense lane compare;
        big states (rows > R, e.g. the unigram root every backoff chain
        lands on) are answered by a word-indexed dense table with a single
        N-sized gather. No serialized binary search anywhere — this is
        the TPU analogue of `binarySearchInLabel` + `PushingWeightCache`
        (`WFSTOnTheFlyDecoder.h:253-371`, `WFSTNetwork.cpp:2505`)."""
        dev = self.dev
        dt = self._dt
        N = g.shape[0]
        R = self._g_R
        gw = jnp.zeros((N,), dt)
        ok = jnp.ones((N,), bool)
        done = ~words_valid  # nothing to consume
        cur = jnp.maximum(g, 0)
        in_range = word < self._g_W
        wf = word.astype(dt)
        for _ in range(self._g_maxbo + 1):
            rows = dev["g_row_pack"][cur]  # (N, 3R+3): the ONE row gather
            m = rows[:, :R] == wf[:, None]
            # duplicate (state, il) guard: keep the first match only (the
            # host binary search would find the first too)
            m &= jnp.cumsum(m.astype(jnp.int32), axis=1) <= 1
            hit_sp = jnp.any(m, axis=1)
            mf = m.astype(dt)
            dst_sp = jnp.sum(mf * rows[:, R : 2 * R], axis=1).astype(jnp.int32)
            w_sp = jnp.sum(mf * rows[:, 2 * R : 3 * R], axis=1)
            di = rows[:, 3 * R + 2].astype(jnp.int32)
            use_d = di >= 0
            flat = jnp.clip(di, 0) * self._g_W + jnp.clip(word, 0, self._g_W - 1)
            dst_d = dev["g_dense_dst_flat"][flat]
            w_d = dev["g_dense_w_flat"][flat]
            hit_d = (dst_d >= 0) & in_range
            hit = ~done & jnp.where(use_d, hit_d, hit_sp)
            cur = jnp.where(hit, jnp.where(use_d, dst_d, dst_sp), cur)
            gw = jnp.where(hit, gw + jnp.where(use_d, w_d, w_sp), gw)
            done = done | hit
            # else: back off if possible — lanes that just hit are done, so
            # the backoff fields of the PRE-move row are the right ones
            bo = rows[:, 3 * R].astype(jnp.int32)
            can_bo = ~done & (bo >= 0)
            gw = jnp.where(can_bo, gw + rows[:, 3 * R + 1], gw)
            dead = ~done & ~can_bo
            ok = ok & ~dead
            done = done | dead
            cur = jnp.where(can_bo, bo, cur)
        ok = ok & done
        return cur, gw, ok | ~words_valid

    def _g_advance_seq(self, g, seq_ids):
        """Consume a whole label sequence (seq table row) from G."""
        dev = self.dev
        dt = self._dt
        words = dev["seq_words"][seq_ids]  # (N, L)
        cur = g
        total = jnp.zeros(g.shape, dt)
        ok = jnp.ones(g.shape, bool)
        for li in range(self.seq_len):
            w = words[:, li]
            cur, gw, step_ok = self._g_advance(cur, w != 0, w)
            # only apply when the word slot is used
            used = w != 0
            total = jnp.where(used, total + gw, total)
            ok = ok & jnp.where(used, step_ok, True)
        return cur, total, ok

    def _empty_frontier(self):
        K, S = self.K, self.S
        dt = self._dt
        # NOTE: there is no "lm" plane. Because every weight in the system
        # lands in exactly one of {acoustic, LM} and the per-frame score
        # normalization is a global scalar, score = ac + lm - N_t holds for
        # every live token (N_t = cumulative normalization, carried as one
        # scalar). LM scores are reconstructed as score - ac + N_t at record
        # creation; search never reads them. This removes S sort operands
        # from the frontier-restore sort and one from the merge co-sort —
        # the two ops that dominate the frame step (scripts/profile_step.py).
        fr = {
            # arc = n_arcs+1 is the dead-slot sentinel (sorts last)
            "arc": jnp.full((K,), self.n_arcs + 1, jnp.int32),
            "score": jnp.full((K, S), NEG, dt),
            "ac": jnp.full((K, S), NEG, dt),
            "path": jnp.full((K, S), -1, jnp.int32),
        }
        if self.otf:
            fr["g"] = jnp.zeros((K,), jnp.int32)
            if self.pushing:
                fr["push_la"] = jnp.zeros((K,), dt)
        if self.cfg.gen_lattice:
            # per-TOKEN lattice event id (the entry event whose occupancy the
            # token represents), carried like `path`; -1 = utterance start
            fr["lat"] = jnp.full((K, S), -1, jnp.int32)
        return fr

    # ------------------------------------------------------------------
    # expansion
    # ------------------------------------------------------------------

    def _expand(self, src_score, src_ac, src_path, base, fan, live,
                extra=()):
        """Fixed-budget expansion of exiting tokens through the closure
        tables. src_* are (K,) token fields; base/fan index the packed
        entry table rows for each source. `extra` (K,) fields are broadcast
        to candidates and returned under cand["extra"]. LM deltas are not
        propagated (see _empty_frontier: lm = score - ac + N_t; the entry
        table's w_score is exactly w_lm + w_ac, artifact.py)."""
        dev = self.dev
        dt = self._dt
        K, E = src_score.shape[0], self.E
        fan = jnp.where(live, fan, 0)
        offs = jnp.cumsum(fan) - fan
        total = offs[-1] + fan[-1]
        e_idx = jnp.arange(E, dtype=jnp.int32)
        # Distribute each source's fields across its candidate range: scatter
        # the packed source row at its (unique, ascending) start offset, then
        # forward-fill with a log-depth associative scan. This avoids both a
        # binary search and a gather — everything is vectorized.
        # Entry-table BASES past 2^24 stop being exact in the f32 payload;
        # at WSJ scale (213M closure entries) they ride split into
        # 4096-sized hi/lo halves (each exactly representable) and are
        # reassembled in int32. Below 2^24 the single column is exact
        # (self._base_split, set in __init__).
        if self._base_split:
            base_cols = [(base // 4096).astype(dt), (base % 4096).astype(dt)]
        else:
            base_cols = [base.astype(dt)]
        nb = len(base_cols)
        src_pack = jnp.stack(
            [src_score, src_ac, src_path.astype(dt)]
            + base_cols
            + [fan.astype(dt), offs.astype(dt)]
            + [x.astype(dt) for x in extra],
            axis=1,
        )
        rows, filled = _segment_broadcast(src_pack, offs, fan > 0, E)
        s_score, s_ac = rows[:, 0], rows[:, 1]
        s_path = rows[:, 2].astype(jnp.int32)
        if self._base_split:
            s_base = (
                rows[:, 3].astype(jnp.int32) * 4096
                + rows[:, 4].astype(jnp.int32)
            )
        else:
            s_base = rows[:, 3].astype(jnp.int32)
        s_fan = rows[:, 3 + nb].astype(jnp.int32)
        s_offs = rows[:, 4 + nb].astype(jnp.int32)
        within = e_idx - s_offs
        valid = filled & (e_idx < total) & (within < s_fan)
        ent = jnp.clip(s_base + within, 0, dev["ent_pack"].shape[0] - 1)
        erow = dev["ent_pack"][ent]  # (E, 5): the one sparse row-gather
        cand_arc = jnp.where(valid, erow[:, 0].astype(jnp.int32), 0)
        cand_score = jnp.where(valid, s_score + erow[:, 1], NEG)
        cand_ac = s_ac + erow[:, 3]
        cand_seq = erow[:, 4].astype(jnp.int32)
        return dict(
            arc=cand_arc, score=cand_score, ac=cand_ac,
            prev=s_path, seq=cand_seq, valid=valid & (cand_score > NEG / 2),
            overflow=total > E, n_cand=total, extra=rows[:, 5 + nb:],
        )

    def _expand_finals(self, src_score, src_ac, src_path, base, fan, live,
                       best, norm, extra=()):
        """Final-state candidates (bestFinalToken updates). Returns
        (best, overflow, records) — records carry all valid final
        candidates for lattice final-state registration. `norm` is the
        cumulative score normalization N_t; LM components are reconstructed
        as score - ac + N_t (exit tokens are lookahead-free: pushing
        compensation happens before final expansion)."""
        dev = self.dev
        dt = self._dt
        K, F = src_score.shape[0], self.F
        fan = jnp.where(live, fan, 0)
        offs = jnp.cumsum(fan) - fan
        total = offs[-1] + fan[-1]
        e_idx = jnp.arange(F, dtype=jnp.int32)
        # hi/lo base split: see _expand
        if self._base_split:
            base_cols = [(base // 4096).astype(dt), (base % 4096).astype(dt)]
        else:
            base_cols = [base.astype(dt)]
        nb = len(base_cols)
        src_pack = jnp.stack(
            [src_score, src_ac, src_path.astype(dt)]
            + base_cols
            + [fan.astype(dt), offs.astype(dt)]
            + [x.astype(dt) for x in extra],
            axis=1,
        )
        rows, filled = _segment_broadcast(src_pack, offs, fan > 0, F)
        within = e_idx - rows[:, 4 + nb].astype(jnp.int32)
        valid = (
            filled & (e_idx < total)
            & (within < rows[:, 3 + nb].astype(jnp.int32))
        )
        if self._base_split:
            f_base_r = (
                rows[:, 3].astype(jnp.int32) * 4096
                + rows[:, 4].astype(jnp.int32)
            )
        else:
            f_base_r = rows[:, 3].astype(jnp.int32)
        ent = jnp.clip(f_base_r + within, 0, dev["f_pack"].shape[0] - 1)
        frow = dev["f_pack"][ent]  # (F, 4)
        sc = jnp.where(valid, rows[:, 0] + frow[:, 0], NEG)
        ac = rows[:, 1] + frow[:, 2]
        i = jnp.argmax(sc)
        better = sc[i] > best["score"]
        # extras are packed after the base source columns; callers always
        # pass the source arc first (see _frame_step/_init_carry)
        src = rows[:, 5 + nb].astype(jnp.int32)
        new = {
            "score": jnp.where(better, sc[i], best["score"]),
            "ac": jnp.where(better, ac[i], best["ac"]),
            "lm": jnp.where(better, sc[i] - ac[i] + norm, best["lm"]),
            "path": jnp.where(better, rows[i, 2].astype(jnp.int32), best["path"]),
            "seq": jnp.where(better, frow[i, 3].astype(jnp.int32), best["seq"]),
            "src": jnp.where(better, src[i], best["src"]),
        }
        records = {
            "score": sc,
            "ac": ac,
            "lm": sc - ac + norm,
            "path": rows[:, 2].astype(jnp.int32),
            "seq": frow[:, 3].astype(jnp.int32),
            "src": src,
            "valid": valid,
            "extra": rows[:, 5 + nb:],
        }
        return new, total > F, records

    # ------------------------------------------------------------------
    # recombination + insertion
    # ------------------------------------------------------------------

    def _merge_and_insert(self, fr, cand, t, norm):
        if self.merge_strategy == "sort":
            return self._merge_and_insert_sort(fr, cand, t, norm)
        return self._merge_and_insert_dense(fr, cand, t, norm)

    def _merge_and_insert_dense(self, fr, cand, t, norm):
        """Sort-free dense segment-max recombination + dense slot routing.
        `norm` is the cumulative normalization N_t used to reconstruct
        record LM scores (lm = score - ac + N_t, minus the just-applied
        lookahead in OTF pushing mode).

        Recombination winners (per-(arc[, g])-group argmax, ties broken by
        lowest candidate index like the reference's first-come merge) are
        found with a dense (E, E) boolean compare at ORIGINAL positions —
        payloads never move, so the former (K+E)-row multi-operand bitonic
        co-sort (the dominant per-frame cost) disappears entirely. The
        frontier lives in ARBITRARY slot order and holds at most ONE live
        slot per (arc[, g]) key (the slot-uniqueness invariant), so routing
        a winner into its existing slot is a dense (E, K) equality compare
        + integer select-reduce. New winners are ranked by a prefix sum and
        matched to free slots (ranked the same way) with an exact one-hot
        select — no data-dependent gather anywhere."""
        K, S, E = self.K, self.S, self.E
        dt = self._dt
        dead = jnp.int32(self.n_arcs + 1)

        # liveness: any token in states 0..S-2 (the entry column 0 and exit
        # column S-1 are always NEG at this point, post-internal-
        # propagation: entry is rewritten by the insertion below and exit
        # tokens were consumed by the expansion)
        live = jnp.any(fr["score"][:, : S - 1] > NEG / 2, axis=1) & (
            fr["arc"] <= self.n_arcs
        ) & (fr["arc"] >= 0)
        arc_cur = jnp.where(live, fr["arc"], dead)
        n_live = jnp.sum(live.astype(jnp.int32))

        otf = self.otf
        lat = self.cfg.gen_lattice
        pushing = self.pushing
        valid = cand["valid"]
        ck = jnp.where(valid, cand["arc"], dead)
        cg = cand["g"] if otf else None
        g_score = jnp.where(valid, cand["score"], NEG)
        g_ac, g_prev, g_seq = cand["ac"], cand["prev"], cand["seq"]
        g_la = cand["la"] if pushing else None
        # record LM = score - ac + N_t, minus the new arc's outstanding
        # lookahead in pushing mode (it is in score but not yet in the LM)
        g_lm = g_score - g_ac + norm - (g_la if pushing else 0.0)
        # dense segment-max winner detection AT ORIGINAL POSITIONS: within a
        # (arc[, g]) key group the winner is the best-scoring candidate,
        # ties broken by lowest index (the reference's first-come tie
        # break). An (E, E) boolean compare finds it without moving any
        # payload — no bitonic network anywhere in the merge (the former
        # (K+E)-row multi-operand co-sort WAS the dominant per-frame cost,
        # scripts/profile_step.py). NOTE this is not the failed
        # counting-rank experiment from the working notes: that still
        # computed a full permutation + row scatter; here order is never
        # materialized, only the per-group argmax mask.
        e_iota = jnp.arange(E, dtype=jnp.int32)
        same = valid[:, None] & valid[None, :] & (ck[:, None] == ck[None, :])
        if otf:
            same &= cg[:, None] == cg[None, :]
        beats = same & (
            (g_score[:, None] > g_score[None, :])
            | ((g_score[:, None] == g_score[None, :]) & (e_iota[:, None] < e_iota[None, :]))
        )
        winner_c = valid & ~jnp.any(beats, axis=0)
        # dense slot routing: match each winner's key against the live
        # frontier (exact integer select-reduce; a one-hot f32 matmul here
        # materializes an (E, K) operand per frame and lowers to a batched
        # GEMV — measured much slower on the old (K+E, K) variant)
        km = jnp.arange(K, dtype=jnp.int32)[None, :]
        matchm = (
            winner_c[:, None] & live[None, :] & (ck[:, None] == arc_cur[None, :])
        )
        if otf:
            matchm &= cg[:, None] == fr["g"][None, :]
        hit = jnp.any(matchm, axis=1)
        slot_hit = jnp.sum(jnp.where(matchm, km, 0), axis=1)
        need_new = winner_c & ~hit
        # rank new winners and free slots by the same prefix-sum order and
        # match rank i to rank i
        nn_i = need_new.astype(jnp.int32)
        new_rank = jnp.cumsum(nn_i) - nn_i
        n_free = K - n_live
        overflow = jnp.any(need_new & (new_rank >= n_free))
        free = ~live
        fi = free.astype(jnp.int32)
        free_rank = jnp.cumsum(fi) - fi
        ohm = (
            need_new[:, None]
            & free[None, :]
            & (new_rank[:, None] == free_rank[None, :])
        )
        slot_new = jnp.sum(jnp.where(ohm, km, 0), axis=1)
        slot = jnp.where(
            hit,
            slot_hit,
            jnp.where(need_new & (new_rank < n_free), slot_new, -1),
        )
        w_ok = winner_c & (slot >= 0) & (slot < K)
        slot_w = jnp.where(w_ok, slot, K)  # K = out of bounds -> dropped

        rec_id = (t * K + slot_w).astype(jnp.int32)
        has_seq = g_seq != 0
        entry_path = jnp.where(has_seq, rec_id, g_prev)

        # packed row scatter: [arc, score, ac, lm, entry_path, prev, seq,
        # has_seq, got, src (, g)]
        cols = [
            ck.astype(dt),
            g_score,
            g_ac,
            g_lm,
            entry_path.astype(dt),
            g_prev.astype(dt),
            g_seq.astype(dt),
            has_seq.astype(dt),
            jnp.ones((E,), dt),
            cand["src"].astype(dt),
        ]
        if otf:
            cols.append(cg.astype(dt))
        if pushing:
            cols.append(g_la)
        payload = jnp.stack(cols, axis=1)
        landed = jnp.zeros((K, len(cols)), dt)
        landed = landed.at[slot_w].set(payload, mode="drop", unique_indices=True)
        got = landed[:, 8] > 0.5

        arc_new = jnp.where(got, landed[:, 0].astype(jnp.int32), arc_cur)
        score = fr["score"].at[:, 0].set(jnp.where(got, landed[:, 1], NEG))
        ac = fr["ac"].at[:, 0].set(jnp.where(got, landed[:, 2], NEG))
        path = fr["path"].at[:, 0].set(
            jnp.where(got, landed[:, 4].astype(jnp.int32), -1)
        )

        rec_valid = got & (landed[:, 7] > 0.5)
        rec = {
            "prev": jnp.where(rec_valid, landed[:, 5].astype(jnp.int32), -1),
            "seq": jnp.where(rec_valid, landed[:, 6].astype(jnp.int32), 0),
            "score": jnp.where(rec_valid, landed[:, 1], NEG),
            "ac": jnp.where(rec_valid, landed[:, 2], NEG),
            "lm": jnp.where(rec_valid, landed[:, 3], NEG),
            # source/landing arcs let the traceback recover crossing-time
            # per-label scores (artifact.remainders)
            "src": jnp.where(rec_valid, landed[:, 9].astype(jnp.int32), -1),
            "arc": jnp.where(rec_valid, landed[:, 0].astype(jnp.int32), -1),
            # observability: surviving + newly allocated insts this frame
            # (the reference's avgActiveModels counters,
            # `WFSTDecoderLite.cpp:230-241`); hits land on live slots and
            # must not be double-counted
            "n_active": jnp.sum((live | got).astype(jnp.int32)),
        }

        best_new = jnp.max(jnp.where(w_ok, g_score, NEG))
        fr_new = {"arc": arc_new, "score": score, "ac": ac, "path": path}
        if otf:
            fr_new["g"] = jnp.where(got, landed[:, 10].astype(jnp.int32), fr["g"])
        if pushing:
            fr_new["push_la"] = jnp.where(got, landed[:, -1], fr["push_la"])
        if lat:
            # the landing slot becomes a new lattice event; its id is the
            # same (t*K + slot) encoding used for path records
            ev_id = (t * K + jnp.arange(K, dtype=jnp.int32)).astype(jnp.int32)
            fr_new["lat"] = fr["lat"].at[:, 0].set(jnp.where(got, ev_id, -1))
            rec["ev_arc"] = jnp.where(got, arc_new, -1)
            rec["ev_ac"] = landed[:, 2]
            rec["ev_lm"] = landed[:, 3]
            if otf:
                rec["ev_g"] = jnp.where(got, fr_new["g"], 0)
        return fr_new, rec, best_new, overflow

    def _merge_and_insert_sort(self, fr, cand, t, norm):
        """Sort-based recombination + insertion for WSJ-order budgets.

        The dense strategy's (E, E) winner compare and (E, K) slot routing
        are quadratic; at K~8k / E~32k they materialize ~10^9-element
        intermediates per frame. This variant does the whole merge with ONE
        stable multi-operand bitonic sort of K+E rows keyed by
        (arc[, g], kind, -score), payloads carried through (narrow
        data-dependent row-gathers lose to the extra bitonic operand
        traffic — A/B'd on v5e, see working notes):

          1. restore-sort the frontier by (live ? arc : dead) so live rows
             compact to slots [0, n_live) in key order;
          2. co-sort frontier heads (kind 0) with all candidates (kind 1):
             within a key group the head (if any) comes first, then
             candidates best-first — the group's FIRST candidate is the
             segment-max winner (stable sort = reference's first-come tie
             break), and it merges into an existing slot iff preceded by a
             head (slot = #frontier rows before it − 1);
          3. new winners take slots n_live + prefix-sum rank.

        Outputs (records, frontier contents, best score, overflow flag) are
        identical to the dense strategy up to slot numbering, which is
        self-consistent through the (t*K + slot) record encoding."""
        K, S, E = self.K, self.S, self.E
        dt = self._dt
        dead = jnp.int32(self.n_arcs + 1)
        otf = self.otf
        lat = self.cfg.gen_lattice
        pushing = self.pushing

        # ---- 1. frontier restore sort (live compacted, key-ordered) ------
        live = jnp.any(fr["score"][:, : S - 1] > NEG / 2, axis=1) & (
            fr["arc"] <= self.n_arcs
        ) & (fr["arc"] >= 0)
        key = jnp.where(live, fr["arc"], dead)
        names = ("score", "ac", "path") + (("lat",) if lat else ())
        fills = {"score": NEG, "ac": NEG, "path": -1, "lat": -1}
        ops = [key] + ([fr["g"]] if otf else [])
        for name in names:
            for j in range(S):
                ops.append(fr[name][:, j])
        if pushing:
            ops.append(fr["push_la"])
        sorted_ops = jax.lax.sort(tuple(ops), num_keys=2 if otf else 1)
        key_s = sorted_ops[0]
        idx = 1
        fr2 = {"arc": jnp.where(key_s >= dead, dead, key_s)}
        if otf:
            fr2["g"] = jnp.where(key_s >= dead, 0, sorted_ops[1])
            idx = 2
        if pushing:
            fr2["push_la"] = jnp.where(key_s >= dead, 0.0, sorted_ops[-1])
        for name in names:
            fill = fills[name]
            cols = []
            for j in range(S):
                c = sorted_ops[idx]
                idx += 1
                cols.append(jnp.where(key_s >= dead, jnp.asarray(fill, c.dtype), c))
            fr2[name] = jnp.stack(cols, axis=1)
        fr = fr2
        n_live = jnp.sum((key_s < dead).astype(jnp.int32))

        # ---- 2. the (K+E)-row co-sort ------------------------------------
        valid = cand["valid"]
        Z = jnp.zeros((K,), dt)
        ZI = jnp.zeros((K,), jnp.int32)
        comb_key = jnp.concatenate(
            [fr["arc"], jnp.where(valid, cand["arc"], dead)]
        )
        comb_kind = jnp.concatenate(
            [jnp.zeros((K,), jnp.int32), jnp.ones((E,), jnp.int32)]
        )
        comb_negscore = jnp.concatenate(
            [Z, jnp.where(valid, -cand["score"], jnp.asarray(-NEG, dt))]
        )
        if otf:
            # key order must be (arc, G state, kind): keep separate keys
            comb_ops = [
                comb_key,
                jnp.concatenate([fr["g"], jnp.where(valid, cand["g"], 0)]),
                comb_kind,
                comb_negscore,
            ]
            nk = 4
        else:
            # pack (arc, kind) into one int key: same lexicographic order,
            # one fewer operand through the bitonic network (arc < 2^24 is
            # already required by the f32 packed tables, so arc*2+1 fits)
            comb_ops = [comb_key * 2 + comb_kind, comb_negscore]
            nk = 2
        comb_ops += [
            jnp.concatenate([Z, cand["ac"]]),
            jnp.concatenate([ZI, cand["prev"]]),
            jnp.concatenate([ZI, cand["seq"]]),
            jnp.concatenate([ZI, cand["src"]]),
        ]
        if pushing:
            comb_ops.append(jnp.concatenate([Z, cand["la"]]))
        sorted_comb = jax.lax.sort(tuple(comb_ops), num_keys=nk, is_stable=True)
        if otf:
            (ck, cgk, ckind, g_negscore, g_ac, g_prev, g_seq, g_src) = sorted_comb[:8]
            same_key = (ck[1:] == ck[:-1]) & (cgk[1:] == cgk[:-1])
        else:
            (pk, g_negscore, g_ac, g_prev, g_seq, g_src) = sorted_comb[:6]
            ck = pk // 2
            ckind = pk % 2
            cgk = None
            same_key = ck[1:] == ck[:-1]
        g_la = sorted_comb[-1] if pushing else None
        g_score = -g_negscore
        # record LM = score - ac + N_t, minus the new arc's outstanding
        # lookahead in pushing mode (see _empty_frontier)
        g_lm = g_score - g_ac + norm - (g_la if pushing else 0.0)
        is_cand = ckind == 1
        prev_same_frontier = jnp.concatenate(
            [jnp.zeros((1,), bool), same_key & (ckind[:-1] == 0)]
        )
        prev_same_group = jnp.concatenate([jnp.zeros((1,), bool), same_key])
        first_cand = is_cand & (~prev_same_group | prev_same_frontier)
        winner_c = first_cand & (ck < dead)
        ccount = jnp.cumsum(ckind) - ckind  # candidates strictly before
        q_idx = jnp.arange(K + E, dtype=jnp.int32)
        f_before = q_idx - ccount
        hit = winner_c & prev_same_frontier
        need_new = winner_c & ~prev_same_frontier
        alloc = n_live + jnp.cumsum(need_new.astype(jnp.int32)) - 1
        overflow = jnp.any(need_new & (alloc >= K))
        slot = jnp.where(hit, f_before - 1, jnp.where(need_new, alloc, -1))
        w_ok = winner_c & (slot >= 0) & (slot < K)
        slot_w = jnp.where(w_ok, slot, K)  # K = out of bounds -> dropped

        rec_id = (t * K + slot_w).astype(jnp.int32)
        has_seq = g_seq != 0
        entry_path = jnp.where(has_seq, rec_id, g_prev)

        # ---- 3. packed winner scatter ------------------------------------
        # cols: [arc, score, ac, lm, entry_path, prev, seq, has_seq, got,
        # src (, g)(, la)]
        cols = [
            ck.astype(dt),
            g_score,
            g_ac,
            g_lm,
            entry_path.astype(dt),
            g_prev.astype(dt),
            g_seq.astype(dt),
            has_seq.astype(dt),
            jnp.ones((K + E,), dt),
            g_src.astype(dt),
        ]
        if otf:
            cols.append(cgk.astype(dt))
        if pushing:
            cols.append(g_la)
        payload = jnp.stack(cols, axis=1)
        landed = jnp.zeros((K, len(cols)), dt)
        landed = landed.at[slot_w].set(payload, mode="drop", unique_indices=True)
        got = landed[:, 8] > 0.5

        arc_new = jnp.where(got, landed[:, 0].astype(jnp.int32), fr["arc"])
        score = fr["score"].at[:, 0].set(jnp.where(got, landed[:, 1], NEG))
        ac = fr["ac"].at[:, 0].set(jnp.where(got, landed[:, 2], NEG))
        path = fr["path"].at[:, 0].set(
            jnp.where(got, landed[:, 4].astype(jnp.int32), -1)
        )

        rec_valid = got & (landed[:, 7] > 0.5)
        rec = {
            "prev": jnp.where(rec_valid, landed[:, 5].astype(jnp.int32), -1),
            "seq": jnp.where(rec_valid, landed[:, 6].astype(jnp.int32), 0),
            "score": jnp.where(rec_valid, landed[:, 1], NEG),
            "ac": jnp.where(rec_valid, landed[:, 2], NEG),
            "lm": jnp.where(rec_valid, landed[:, 3], NEG),
            "src": jnp.where(rec_valid, landed[:, 9].astype(jnp.int32), -1),
            "arc": jnp.where(rec_valid, landed[:, 0].astype(jnp.int32), -1),
            # hits land inside the live prefix and must not double-count
            "n_active": n_live + jnp.sum(
                (got & (jnp.arange(K) >= n_live)).astype(jnp.int32)
            ),
        }

        best_new = jnp.max(jnp.where(w_ok, g_score, NEG))
        fr_new = {"arc": arc_new, "score": score, "ac": ac, "path": path}
        if otf:
            fr_new["g"] = jnp.where(got, landed[:, 10].astype(jnp.int32), fr["g"])
        if pushing:
            fr_new["push_la"] = jnp.where(got, landed[:, -1], fr["push_la"])
        if lat:
            ev_id = (t * K + jnp.arange(K, dtype=jnp.int32)).astype(jnp.int32)
            fr_new["lat"] = fr["lat"].at[:, 0].set(jnp.where(got, ev_id, -1))
            rec["ev_arc"] = jnp.where(got, arc_new, -1)
            rec["ev_ac"] = landed[:, 2]
            rec["ev_lm"] = landed[:, 3]
            if otf:
                rec["ev_g"] = jnp.where(got, fr_new["g"], 0)
        return fr_new, rec, best_new, overflow

    # ------------------------------------------------------------------
    # per-frame step
    # ------------------------------------------------------------------

    def _frame_step(self, carry, frame_in):
        cfg = self.cfg
        dev = self.dev
        K, S, H = self.K, self.S, self.H
        dt = self._dt
        gmm_t, t = frame_in["gmm"], frame_in["t"]
        fr = carry["fr"]

        normalise = jnp.where(
            carry["best_emit"] > NEG / 2, carry["best_emit"], 0.0
        ).astype(dt)
        # cumulative normalization N_t: all live token scores are offset by
        # exactly this much, so lm = score - ac + N_t at any record point
        norm = carry["norm"] + normalise

        # emit threshold (binned/exact histogram ∧ main beam)
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
        entry = fr["score"][:, 0]
        fr["score"] = fr["score"].at[:, 0].set(jnp.where(entry < start_thresh, NEG, entry))

        # per-arc metadata: one row-gather
        meta = dev["arc_meta"][jnp.minimum(fr["arc"], self.n_arcs + 1)]  # (K, 6)
        hmm = meta[:, 0].astype(jnp.int32)
        arc_ol = meta[:, 1].astype(jnp.int32)

        # per-frame per-HMM state scores (one tiny gather over H*S), then all
        # topology via ONE exact one-hot matmul (K, H) @ (H, S*S + 2S)
        hmm_scores = gmm_t[dev["state_gmm"].reshape(-1)].reshape(H, S)
        topo = jnp.concatenate([dev["trP_flat"], dev["sg_mask"], hmm_scores], axis=1)
        rows = self._onehot_matmul(hmm, H, topo)  # (K, S*S + 2S)
        trP = rows[:, : S * S].reshape(K, S, S)
        emitting = rows[:, S * S : S * S + S] > 0.5  # (K, S)
        outp = rows[:, S * S + S :]  # (K, S)
        # dead slots: kill transitions
        deadm = (fr["arc"] > self.n_arcs)[:, None, None]
        trP = jnp.where(deadm, NEG, trP)

        m = fr["score"][:, :, None] + trP  # (K, i, j)
        new_score = jnp.max(m, axis=1)
        best_i = jnp.argmax(m, axis=1)
        oh = jax.lax.broadcasted_iota(jnp.int32, (K, S, S), 1) == best_i[:, None, :]
        ohf = oh.astype(dt)
        new_ac = jnp.einsum("kij,ki->kj", ohf, fr["ac"]) + jnp.sum(ohf * trP, axis=1)
        new_path = jnp.sum(oh * fr["path"][:, :, None], axis=1, dtype=jnp.int32)

        ns = new_score - normalise
        pass_emit = emitting & (ns > emit_thresh) & (new_score > NEG / 2)
        e_score = jnp.where(pass_emit, ns + outp, NEG)
        e_ac = jnp.where(pass_emit, new_ac + outp, NEG)
        e_path = jnp.where(pass_emit, new_path, -1)
        if cfg.gen_lattice:
            new_lat = jnp.sum(oh * fr["lat"][:, :, None], axis=1, dtype=jnp.int32)
            lat2 = jnp.where(emitting & pass_emit, new_lat, -1)

        best_emit = jnp.max(jnp.where(pass_emit, e_score, NEG))
        if cfg.max_emit_hyps > 0:
            flat = jnp.where(pass_emit, e_score, NEG).reshape(-1)
            # a frontier of K*S tokens can never hold more than K*S live
            # hyps, so clamping k is exact: the k-th-best threshold can only
            # bind when more than k real hypotheses exist
            if cfg.histogram_mode == "binned":
                # `Histogram::calcThresh` with binWidth 1: C-ROUND the
                # scores, drop below minScore, clamp above maxScore (where
                # the reference would abort), count per integer bin, then
                # take the lowest bin whose top-down cumulative count
                # reaches maxN, minus 0.5; count <= maxN gives the
                # minScore floor (`Histogram.cpp:134-158`). The bin counts
                # are ONE fused (N, n_bins) compare-reduce — at WSJ-order
                # frontiers this replaces a full bitonic top_k sort.
                sc = jnp.trunc(jnp.where(flat < 0, flat - 0.5, flat + 0.5))
                sc = jnp.minimum(sc, self._hist_max)
                sc = jnp.where((flat > NEG / 2) & (sc >= self._hist_min), sc, NEG)
                nb = int(self._hist_max - self._hist_min) + 1
                bins = self._hist_min + jnp.arange(nb, dtype=dt)
                counts = jnp.sum(
                    (sc[:, None] == bins[None, :]).astype(jnp.int32), axis=0
                )
                cum = jnp.cumsum(counts[::-1])[::-1]  # >= bin, from top
                binding = jnp.sum(counts) > cfg.max_emit_hyps
                idx = jnp.max(
                    jnp.where(cum >= cfg.max_emit_hyps,
                              jnp.arange(nb, dtype=jnp.int32), -1)
                )
                kth_emit = jnp.where(
                    binding,
                    self._hist_min + idx.astype(dt) - 0.5,
                    jnp.asarray(self._hist_min - 0.5, dt),
                )
            else:
                kth = jax.lax.top_k(flat, min(cfg.max_emit_hyps, flat.shape[0]))[0][-1]
                kth_emit = jnp.where(kth > NEG / 2, kth, NEG)
        else:
            kth_emit = jnp.asarray(NEG, dt)

        score2 = jnp.where(emitting, e_score, NEG)
        ac2 = jnp.where(emitting, e_ac, NEG)
        path2 = jnp.where(emitting, e_path, -1)

        # exit state via one-hot over the winning emitting j
        exit_w = trP[:, :, S - 1]
        exit_cand = jnp.where(emitting, score2, NEG) + exit_w
        j_best = jnp.argmax(exit_cand, axis=1)
        ohj = jax.lax.broadcasted_iota(jnp.int32, (K, S), 1) == j_best[:, None]
        ohjf = ohj.astype(dt)
        exit_score = jnp.max(exit_cand, axis=1)
        exit_ok = exit_score > NEG / 2
        exit_score = jnp.where(exit_ok, exit_score, NEG)
        exit_ac = jnp.where(exit_ok, jnp.sum(ohjf * (ac2 + exit_w), axis=1), NEG)
        exit_path = jnp.where(
            exit_ok, jnp.sum(ohj * path2, axis=1, dtype=jnp.int32), -1
        )
        best_end = jnp.max(exit_score)

        fr2 = {"arc": fr["arc"], "score": score2, "ac": ac2, "path": path2}
        if cfg.gen_lattice:
            fr2["lat"] = lat2
            exit_lat = jnp.where(
                exit_ok, jnp.sum(ohj * lat2, axis=1, dtype=jnp.int32), -1
            )
        if self.otf:
            fr2["g"] = fr["g"]
            if self.pushing:
                fr2["push_la"] = fr["push_la"]
        fr = fr2

        # ---- external propagation ----------------------------------------
        end_thresh = (
            best_end - cfg.phone_end_prune_win
            if cfg.phone_end_prune_win > 0.0
            else jnp.asarray(NEG, dt)
        )
        word_thresh = (
            best_end - cfg.word_prune_win
            if cfg.word_prune_win > 0.0
            else jnp.asarray(NEG, dt)
        )
        thresh_k = jnp.where(arc_ol == 0, end_thresh, word_thresh)
        live_exit = exit_ok & (exit_score > thresh_k) & (fr["arc"] <= self.n_arcs)
        if self.pushing:
            # remove this inst's lookahead before crossing (the real G
            # weight is applied at the word crossing below)
            exit_score = jnp.where(exit_ok, exit_score - fr["push_la"], exit_score)

        ent_base = meta[:, 2].astype(jnp.int32)
        ent_fan = meta[:, 3].astype(jnp.int32)
        f_base = meta[:, 4].astype(jnp.int32)
        f_fan = meta[:, 5].astype(jnp.int32)
        lat = self.cfg.gen_lattice
        # extra columns broadcast to candidates: [source arc][, lat event
        # id][, G state]. The source arc is recorded with each path record
        # so the host traceback can recover per-label crossing-time scores
        # (artifact.remainders).
        extra = (
            (fr["arc"],)
            + ((exit_lat,) if lat else ()) + ((fr["g"],) if self.otf else ())
        )
        cand = self._expand(
            exit_score, exit_ac, exit_path, ent_base, ent_fan, live_exit,
            extra=extra,
        )
        cand["src"] = cand["extra"][:, 0].astype(jnp.int32)
        best_final, f_overflow, frecs = self._expand_finals(
            exit_score, exit_ac, exit_path, f_base, f_fan, live_exit,
            carry_best_zero(dt), norm, extra=extra,
        )
        if self.otf:
            # intersect crossed word labels with G (match-or-backoff); the
            # candidate key becomes the (arc, g') pair and the LM weight
            # absorbs the G arc/backoff weights
            g0 = cand["extra"][:, -1].astype(jnp.int32)
            g2, gw, okg = self._g_advance_seq(g0, cand["seq"])
            cand["g"] = g2
            cand["score"] = jnp.where(okg, cand["score"] + gw, NEG)
            cand["valid"] = cand["valid"] & okg
            if self.pushing:
                # label-and-weight pushing: add the G weight of the target
                # arc's anticipated singleton word now (pruning sees LM
                # information early); compensated at exit. Candidates whose
                # anticipated word cannot be matched in G die here.
                pl = dev["push_label"][jnp.minimum(cand["arc"], self.n_arcs + 1)]
                _, push_w, ok_push = self._g_advance(cand["g"], pl != 0, pl)
                la = jnp.where((pl != 0) & ok_push, push_w, 0.0)
                cand["valid"] = cand["valid"] & ((pl == 0) | ok_push)
                cand["score"] = jnp.where(
                    cand["valid"], cand["score"] + la, cand["score"]
                )
                cand["la"] = la
            # finals: consume the eps-path words, then reach a G final via
            # backoff (getStatesOnEpsPath analogue, precomputed)
            fg0 = frecs["extra"][:, -1].astype(jnp.int32)
            fg2, fgw, fokg = self._g_advance_seq(fg0, frecs["seq"])
            freach = dev["g_freach"][fg2]
            frecs["valid"] = frecs["valid"] & fokg & (freach > NEG / 2)
            frecs["score"] = jnp.where(
                frecs["valid"], frecs["score"] + fgw + freach, NEG
            )
            frecs["lm"] = frecs["lm"] + fgw + freach
            fsc = frecs["score"]
            fi = jnp.argmax(fsc)
            fbetter = fsc[fi] > NEG / 2
            best_final = {
                "score": jnp.where(fbetter, fsc[fi], NEG),
                "ac": jnp.where(fbetter, frecs["ac"][fi], NEG),
                "lm": jnp.where(fbetter, frecs["lm"][fi], NEG),
                "path": jnp.where(fbetter, frecs["path"][fi], -1),
                "seq": jnp.where(fbetter, frecs["seq"][fi], 0),
                "src": jnp.where(fbetter, frecs["src"][fi], -1),
            }

        fr, rec, best_entry, m_overflow = self._merge_and_insert(fr, cand, t, norm)

        best_emit = jnp.maximum(best_emit, best_entry)
        best_start = best_entry

        carry_new = {
            "fr": fr,
            "best_emit": best_emit,
            "best_start": best_start,
            "kth_emit": kth_emit,
            "best_final": best_final,
            "norm": norm,
            "overflow": carry["overflow"] | cand["overflow"] | m_overflow | f_overflow,
        }
        ys = {
            "rec_prev": rec["prev"],
            "rec_seq": rec["seq"],
            "rec_score": rec["score"],
            "rec_ac": rec["ac"],
            "rec_lm": rec["lm"],
            "rec_src": rec["src"],
            "rec_arc": rec["arc"],
        }
        if cfg.emit_diagnostics:
            # per-frame best-final snapshot: lets a padded batch read the
            # exact result at each utterance's true length
            ys["bf_score"] = best_final["score"]
            ys["bf_ac"] = best_final["ac"]
            ys["bf_lm"] = best_final["lm"]
            ys["bf_path"] = best_final["path"]
            ys["bf_seq"] = best_final["seq"]
            ys["bf_src"] = best_final["src"]
            ys["n_active"] = rec["n_active"]
            ys["n_cand"] = cand["n_cand"]
        if lat:
            # lattice edges: every valid candidate (winner or not) is a
            # lattice transition, from the exiting token's entry EVENT to
            # the (frame, target-arc) event — the analogue of
            # addLatticeEntry on every extendModelEndState call
            # (`WFSTDecoder.cpp:803-1040`, `WFSTLattice.cpp:160-240`).
            # Scores are cumulative; the host subtracts per-event cums.
            ys["lat_from_ev"] = cand["extra"][:, 1].astype(jnp.int32)
            ys["lat_to_arc"] = cand["arc"]
            ys["lat_ac"] = cand["ac"]
            # reconstructed cumulative LM (see _empty_frontier); subtract
            # the outstanding lookahead in pushing mode
            ys["lat_lm"] = (
                cand["score"] - cand["ac"] + norm
                - (cand["la"] if self.pushing else 0.0)
            )
            ys["lat_seq"] = cand["seq"]
            ys["lat_valid"] = cand["valid"]
            ys["flat_from_ev"] = frecs["extra"][:, 1].astype(jnp.int32)
            ys["flat_ac"] = frecs["ac"]
            ys["flat_lm"] = frecs["lm"]
            ys["flat_seq"] = frecs["seq"]
            ys["flat_valid"] = frecs["valid"]
            ys["ev_arc"] = rec["ev_arc"]
            ys["ev_ac"] = rec["ev_ac"]
            ys["ev_lm"] = rec["ev_lm"]
            if self.otf:
                # lattice events/edges are keyed by the (arc, G state) pair
                ys["lat_to_g"] = cand["g"]
                ys["ev_g"] = rec["ev_g"]
        return carry_new, ys

    # ------------------------------------------------------------------
    # full decode
    # ------------------------------------------------------------------

    def _init_carry(self):
        dt = self._dt
        fr = self._empty_frontier()
        K = self.K
        # initial propagation: virtual start source occupies row n_arcs of
        # the metadata table
        src_score = jnp.full((K,), NEG, dt).at[0].set(0.0)
        src_zero = jnp.zeros((K,), dt)
        src_path = jnp.full((K,), -1, jnp.int32)
        live = jnp.zeros((K,), bool).at[0].set(True)
        meta0 = self.dev["arc_meta"][self.n_arcs]
        base = jnp.full((K,), meta0[2], jnp.int32)
        fan = jnp.full((K,), meta0[3], jnp.int32)
        fb = jnp.full((K,), meta0[4], jnp.int32)
        ff = jnp.full((K,), meta0[5], jnp.int32)
        lat = self.cfg.gen_lattice
        extra = (
            (jnp.full((K,), self.n_arcs, jnp.int32),)  # virtual start src
            + ((jnp.full((K,), -1, jnp.int32),) if lat else ())
            + ((jnp.full((K,), self.g.init_state, jnp.int32),) if self.otf else ())
        )
        norm0 = jnp.asarray(0.0, dt)
        cand = self._expand(src_score, src_zero, src_path, base, fan, live,
                            extra=extra)
        cand["src"] = cand["extra"][:, 0].astype(jnp.int32)
        best_final, f_ov, _frecs = self._expand_finals(
            src_score, src_zero, src_path, fb, ff, live,
            carry_best_zero(dt), norm0, extra=extra,
        )
        if self.otf:
            g0 = cand["extra"][:, -1].astype(jnp.int32)
            g2, gw, okg = self._g_advance_seq(g0, cand["seq"])
            cand["g"] = g2
            cand["score"] = jnp.where(okg, cand["score"] + gw, NEG)
            cand["valid"] = cand["valid"] & okg
            if self.pushing:
                pl = self.dev["push_label"][jnp.minimum(cand["arc"], self.n_arcs + 1)]
                _, push_w, ok_push = self._g_advance(cand["g"], pl != 0, pl)
                la = jnp.where((pl != 0) & ok_push, push_w, 0.0)
                cand["valid"] = cand["valid"] & ((pl == 0) | ok_push)
                cand["score"] = jnp.where(
                    cand["valid"], cand["score"] + la, cand["score"]
                )
                cand["la"] = la
            best_final = carry_best_zero(dt)  # empty-utterance final unused
        fr, rec0, best_entry, m_ov = self._merge_and_insert(fr, cand, -1, norm0)
        if lat:
            rec0["lat_from_ev"] = cand["extra"][:, 1].astype(jnp.int32)
            rec0["lat_to_arc"] = cand["arc"]
            rec0["lat_ac"] = cand["ac"]
            rec0["lat_lm"] = (
                cand["score"] - cand["ac"] + norm0
                - (cand["la"] if self.pushing else 0.0)
            )
            rec0["lat_seq"] = cand["seq"]
            rec0["lat_valid"] = cand["valid"]
            if self.otf:
                rec0["lat_to_g"] = cand["g"]
        # binned histogram: an empty histogram still thresholds at the
        # minScore floor on the first frame (`Histogram::calcThresh` with
        # count <= maxN); exact mode starts unbounded
        kth0 = (
            jnp.asarray(self._hist_min - 0.5, dt)
            if self.cfg.max_emit_hyps > 0 and self.cfg.histogram_mode == "binned"
            else jnp.asarray(NEG, dt)
        )
        carry = {
            "fr": fr,
            # the reference updates bestEmitScore on ENTRY-token creation
            # (`WFSTDecoderLite.cpp:572-573`), including the initial
            # propagation — so frame 0 normalizes by the best init entry
            # score, not 0. (Invisible to shift-covariant thresholds, but
            # the binned histogram's integer bin grid is absolute.)
            "best_emit": best_entry,
            "best_start": best_entry,
            "kth_emit": kth0,
            "best_final": best_final,
            "norm": norm0,
            "overflow": cand["overflow"] | m_ov | f_ov,
        }
        return carry, rec0

    def _decode_scan(self, gmm_scores):
        T = gmm_scores.shape[0]
        carry, rec0 = self._init_carry()
        frame_in = {"gmm": gmm_scores, "t": jnp.arange(T, dtype=jnp.int32)}
        carry, ys = jax.lax.scan(self._frame_step, carry, frame_in,
                                 unroll=self.scan_unroll)
        return carry, ys, rec0

    def _chunk_scan(self, carry, gmm_scores, t0):
        """Continue decoding over one chunk of frames (streaming mode)."""
        T = gmm_scores.shape[0]
        frame_in = {
            "gmm": gmm_scores,
            "t": t0 + jnp.arange(T, dtype=jnp.int32),
        }
        return jax.lax.scan(self._frame_step, carry, frame_in,
                            unroll=self.scan_unroll)

    def stream(self) -> "StreamingDecoder":
        """Streaming session: feed score chunks, get converged partial words
        (the PARTIAL_DECODING equivalent, `WFSTDecoderLite.cpp:822-896`)."""
        from .stream import StreamingDecoder

        return StreamingDecoder(self)

    # utterance lengths are padded up to multiples of this so the jitted
    # scan compiles once per bucket, not once per distinct length; results
    # stay exact via the per-frame best-final snapshot
    T_BUCKET = 128

    def decode_scores(self, gmm_scores: np.ndarray) -> DecodeResult:
        """Decode from a precomputed (T, n_gmms) log-likelihood matrix."""
        T = int(gmm_scores.shape[0])
        if self._dt == jnp.float32 and T * self.K >= (1 << 24):
            raise ValueError(
                f"T*K = {T * self.K} exceeds exact f32 record ids (2^24); "
                f"use dtype='float64' or a shorter utterance/smaller K"
            )
        gmm_scores = np.asarray(gmm_scores)
        if not self.cfg.emit_diagnostics:
            # no best-final snapshots -> no exact padding; decode unpadded
            dev_scores = jnp.asarray(gmm_scores, dtype=self._dt)
            carry, ys, rec0 = self._decode_jit(dev_scores)
            return self._traceback(carry, ys, rec0, T)
        T_pad = max(self.T_BUCKET, -(-T // self.T_BUCKET) * self.T_BUCKET)
        if T_pad != T and T > 0:
            gmm_scores = np.concatenate(
                [gmm_scores, np.repeat(gmm_scores[-1:], T_pad - T, axis=0)]
            )
        dev_scores = jnp.asarray(gmm_scores, dtype=self._dt)
        carry, ys, rec0 = self._decode_jit(dev_scores)
        return self._traceback(
            carry, ys, rec0, int(dev_scores.shape[0]), true_T=T if T_pad != T else None
        )

    def decode_features(self, features: np.ndarray, scorer) -> DecodeResult:
        """Decode raw features with a (T, D) -> (T, n_gmms) scorer."""
        return self.decode_scores(np.asarray(scorer(jnp.asarray(features))))

    def decode_scores_lattice(self, gmm_scores: np.ndarray):
        """Decode and also assemble the word lattice (requires
        config.gen_lattice). Returns (DecodeResult, lattice Fst)."""
        if not self.cfg.gen_lattice:
            raise ValueError("decoder built without gen_lattice=True")
        from .lattice import build_lattice

        gmm_scores = jnp.asarray(gmm_scores, dtype=self._dt)
        carry, ys, rec0 = self._decode_jit(gmm_scores)
        T = int(gmm_scores.shape[0])
        res = self._traceback(carry, ys, rec0, T)
        lattice = build_lattice(self.art, ys, rec0, T)
        return res, lattice

    # ------------------------------------------------------------------
    # traceback (host)
    # ------------------------------------------------------------------

    def _traceback(self, carry, ys, rec0, T, true_T: Optional[int] = None) -> DecodeResult:
        if true_T is not None and true_T < T and true_T > 0:
            # padded batch entry: read the best-final snapshot at the true
            # utterance length
            bf = {
                "score": np.asarray(ys["bf_score"])[true_T - 1],
                "ac": np.asarray(ys["bf_ac"])[true_T - 1],
                "lm": np.asarray(ys["bf_lm"])[true_T - 1],
                "path": np.asarray(ys["bf_path"])[true_T - 1],
                "seq": np.asarray(ys["bf_seq"])[true_T - 1],
                "src": (
                    np.asarray(ys["bf_src"])[true_T - 1]
                    if "bf_src" in ys else np.int32(-1)
                ),
            }
            T = true_T
        else:
            bf = jax.tree.map(np.asarray, carry["best_final"])
        overflow = bool(np.asarray(carry["overflow"]))
        if overflow:
            import warnings

            warnings.warn(
                "TpuDecoder: expansion/frontier budget overflow; results may be pruned"
            )
        na = np.asarray(ys.get("n_active", np.zeros(1)))
        nc = np.asarray(ys.get("n_cand", np.zeros(1)))
        stats = dict(
            avg_active=float(na[:T].mean()) if na.size else 0.0,
            max_active=int(na[:T].max()) if na.size else 0,
            max_cand=int(nc[:T].max()) if nc.size else 0,
            overflow=overflow,
        )
        score = float(bf["score"])
        if score <= NEG / 2:
            return DecodeResult([], [], NEG, NEG, NEG, T, **stats)
        rec_prev = np.asarray(ys["rec_prev"]).reshape(-1)
        rec_seq = np.asarray(ys["rec_seq"]).reshape(-1)
        rec_score = np.asarray(ys["rec_score"]).reshape(-1)
        rec_ac = np.asarray(ys["rec_ac"]).reshape(-1)
        rec_lm = np.asarray(ys["rec_lm"]).reshape(-1)
        # src/landing arcs enable crossing-time word decomposition; absent
        # on the fused-Pallas record stream (falls back to landing values)
        rec_src = (
            np.asarray(ys["rec_src"]).reshape(-1) if "rec_src" in ys else None
        )
        rec_arc = (
            np.asarray(ys["rec_arc"]).reshape(-1) if "rec_arc" in ys else None
        )
        r0 = {k: np.asarray(v) for k, v in rec0.items()}
        K = self.K
        seqs = self.art.seqs

        def rec_fields(pid):
            if pid >= 0:
                src = int(rec_src[pid]) if rec_src is not None else -1
                arc = int(rec_arc[pid]) if rec_arc is not None else -1
                return (
                    int(rec_prev[pid]), int(rec_seq[pid]), float(rec_score[pid]),
                    float(rec_ac[pid]), float(rec_lm[pid]), pid // K, src, arc,
                )
            slot = pid + K  # init records encoded as t=-1 -> pid in [-K, 0)
            # init-propagation words are reported at frame 0, like the
            # reference (recognitionStart runs with currFrame = 0,
            # `WFSTDecoderLite.cpp:141`)
            return (
                int(r0["prev"][slot]), int(r0["seq"][slot]), float(r0["score"][slot]),
                float(r0["ac"][slot]), float(r0["lm"][slot]), 0,
                int(r0["src"][slot]) if "src" in r0 else -1,
                int(r0["arc"][slot]) if "arc" in r0 else -1,
            )

        # Per-label crossing-time values: a record stores its LANDING
        # values (entry of the target arc, closure fully applied); the
        # reference creates each word's Path at the moment its arc is
        # crossed (propagateToken). The difference is a per-closure-edge
        # constant precomputed by artifact.remainders; the overall-last
        # label instead carries the best-final values (recognitionFinish
        # overwrites the first hist node). OTF records interleave G
        # weights with the closure and keep landing values.
        def seg_hyps(labels, frame, s, a, l, rem):
            out = []
            for j, lab in enumerate(labels):
                if rem is not None and j < len(rem):
                    rs, rl, ra = rem[j]
                    out.append(WordHyp(lab, frame, s - rs, a - ra, l - rl))
                else:
                    out.append(WordHyp(lab, frame, s, a, l))
            return out

        use_rem = not self.otf
        segs: list[list[WordHyp]] = []  # last segment first
        fseq = seqs[int(bf["seq"])]
        if fseq:
            rem = (
                self.art.final_remainders(int(bf["src"]), int(bf["seq"]))
                if use_rem and int(bf["src"]) >= 0 else None
            )
            seg = seg_hyps(fseq, T - 1, score, float(bf["ac"]), float(bf["lm"]), rem)
            seg[-1] = WordHyp(seg[-1].word, T - 1, score, float(bf["ac"]),
                              float(bf["lm"]))
            segs.append(seg)
        pid = int(bf["path"])
        first = not fseq
        while pid != -1:
            prev, seq_id, s, a, l, frame, src, arc_b = rec_fields(pid)
            labs = seqs[seq_id]
            rem = (
                self.art.remainders(src, arc_b, seq_id)
                if use_rem and src >= 0 and arc_b >= 0 else None
            )
            seg = seg_hyps(labs, frame, s, a, l, rem)
            if first and seg:
                seg[-1] = WordHyp(seg[-1].word, frame, score, float(bf["ac"]),
                                  float(bf["lm"]))
                first = False
            segs.append(seg)
            pid = prev
        hyps: list[WordHyp] = [h for seg in reversed(segs) for h in seg]
        return DecodeResult(
            words=[h.word for h in hyps],
            word_hyps=hyps,
            score=score,
            acoustic_score=float(bf["ac"]),
            lm_score=float(bf["lm"]),
            n_frames=T,
            **stats,
        )


def carry_best_zero(dt):
    return {
        "score": jnp.asarray(NEG, dt),
        "ac": jnp.asarray(NEG, dt),
        "lm": jnp.asarray(NEG, dt),
        "path": jnp.int32(-1),
        "seq": jnp.int32(0),
        "src": jnp.int32(-1),
    }
