"""Fused Pallas decode scan: the whole per-frame search step in one kernel.

The XLA scan in tpu_core.py is semantically final but pays a fusion-boundary
/ HBM-roundtrip tax on every one of the ~60 small (B, K)/(B, E) ops in the
frame step — an ablation (scripts/profile_step.py) shows the scan *without*
the external-propagation ops runs ~200x faster, i.e. per-frame cost is
almost entirely XLA op overhead, not arithmetic. This module rebuilds the
identical frame step as ONE `pallas_call` whose grid walks the frames of a
chunk while the frontier carry stays resident in VMEM — the TPU-native form
of the reference's single hot loop (`WFSTDecoderLite::processFrame`,
`/root/reference/src/WFSTDecoderLite.cpp:311-372`).

Layout: utterances ride the sublane axis (B rows), frontier slots / entry
candidates ride the lane axis (K = E = multiples of 128). Every op in the
step is a (B, K)-shaped VPU op, an (8, E, K)-shaped compare processed in
8-row sublane groups, or an MXU matmul:

  - per-slot topology rows  -> one-hot(hmm) @ topo        (exact, HIGHEST)
  - per-frame GMM scores    -> gmm_t @ Msel one-hot       (exact, HIGHEST)
  - closure entry rows      -> one-hot(ent) @ ent_table   (exact, HIGHEST)
  - lane-axis prefix sums   -> log-depth pltpu.roll ladders
  - recombination           -> the same dense (E, E) segment-argmax as the
                               XLA path (tpu_core._merge_and_insert)
  - winner insertion        -> dense (E, K) one-hot select-reduce (the
                               scatter becomes a reduction; slots unique)

Semantics are op-for-op identical to tpu_core._frame_step in float32 (the
parity tests assert equality of the traceback records), so the kernel
inherits the reference conformance of the XLA path. Scope: the
static-network fast path (no OTF, no lattice, no histogram top-k) — the
XLA path remains the general engine.

Chunking: one pallas_call covers CHUNK frames (carry enters/leaves through
HBM between chunks) because Mosaic compile time grows with grid size; an
outer lax.scan strings chunks together (same trick as ops/gmm_pallas.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .tpu_core import NEG, TpuDecoder

HI = jax.lax.Precision.HIGHEST

_REC_NAMES = ["rec_prev", "rec_seq", "rec_score", "rec_ac", "rec_lm",
              "rec_src", "rec_arc",
              "bf_score", "bf_ac", "bf_lm", "bf_path", "bf_seq", "bf_src",
              "n_active", "n_cand"]


def max_scan_T(dec: TpuDecoder) -> int:
    """Longest utterance the fused kernel can decode exactly: path/record
    ids are carried in f32 (exact below 2**24), encoded as t*K + slot."""
    return (1 << 24) // dec.K - 1


def pallas_eligible(dec: TpuDecoder) -> bool:
    """The fused kernel covers the static-network float32 fast path."""
    cfg = dec.cfg
    if dec.otf or cfg.gen_lattice or cfg.max_emit_hyps > 0:
        return False
    if cfg.dtype != "float32":
        return False
    if dec.K % 128 or dec.E % 128 or dec.F % 128:
        return False
    if dec.K > 1024 or dec.E > 2048 or dec.F > dec.E:
        return False
    n_ent = dec.dev["ent_pack"].shape[0]
    n_fent = dec.dev["f_pack"].shape[0]
    if n_ent > 65536 or n_fent > 8192 or dec.H > 2048 or dec.S > 8:
        return False
    # all tables must be VMEM-resident
    vmem = (n_ent * 16 + n_fent * 8 + dec.H * (dec.S * dec.S + dec.S)) * 4
    return vmem < 8 * 2 ** 20


def _rup(x, m):
    return ((int(x) + m - 1) // m) * m


def _cumsum_lanes(x, n):
    """Inclusive prefix sum along the last (lane) axis via a log-depth
    Hillis-Steele ladder of pltpu.roll shifts (values are small integers in
    f32, so addition order cannot change the result)."""
    from jax.experimental.pallas import tpu as pltpu

    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    d = 1
    while d < n:
        r = pltpu.roll(x, d, x.ndim - 1)
        x = x + jnp.where(lane >= d, r, 0.0)
        d *= 2
    return x


def _fiota(shape, dim):
    """f32 iota (Mosaic requires integer iota results; cast separately)."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


def _gather_rows(idx, tab_ref, n_rows, width, chunk=128):
    """Exact one-hot row gather: rows[tab][idx] for idx (R0, R1) f32 integer
    indices, returning (R0, R1, width). The one-hot matmul is chunked over
    the table rows so the materialized one-hot never exceeds (R0*R1, chunk).
    Exactly one chunk contributes a nonzero row per index; the rest add an
    exact 0.0, so the f32 accumulation is exact."""
    R0, R1 = idx.shape
    acc = None
    for c0 in range(0, n_rows, chunk):
        cw = min(chunk, n_rows - c0)
        oh3 = (idx[:, :, None] == (_fiota((R0, R1, cw), 2) + float(c0)))
        part = jnp.dot(
            oh3.astype(jnp.float32).reshape(R0 * R1, cw),
            tab_ref[c0:c0 + cw, :],
            preferred_element_type=jnp.float32,
            precision=HI,
        )
        acc = part if acc is None else acc + part
    return acc.reshape(R0, R1, width)


@dataclass
class _Shapes:
    B: int
    K: int
    E: int
    F: int
    S: int
    H: int
    G: int
    n_arcs: int
    n_ent: int
    n_fent: int
    chunk: int


class PallasDecodeScan:
    """Builds and runs the fused decode scan for one TpuDecoder + batch B.

    `__call__(scores)` takes (T, B, n_gmms) log-likelihoods (T a multiple
    of `chunk`) and returns the same (carry, ys) payload as the XLA scan:
    per-frame traceback records, best-final snapshots, and diagnostics.
    """

    def __init__(self, dec: TpuDecoder, B: int, chunk: int = 128,
                 interpret: bool = False, debug_stage: int = 0):
        # debug_stage > 0 truncates the kernel after that stage (outputs
        # are garbage) — a compile-bisect aid for Mosaic crashes
        self.debug_stage = debug_stage
        if not pallas_eligible(dec):
            raise ValueError("decoder config outside the Pallas fast path")
        if B % 8:
            raise ValueError("batch must be a multiple of 8")
        self.dec = dec
        art = dec.art
        K, E, F, S, H = dec.K, dec.E, dec.F, dec.S, dec.H

        ex = art.expansion
        n_ent_real = len(ex.arc)
        n_fent_real = len(ex.f_score)
        n_ent = _rup(max(n_ent_real, 1), 128)
        n_fent = _rup(max(n_fent_real, 1), 128)
        n_arcs = dec.n_arcs
        sg = np.asarray(art.state_gmm)
        G = int(sg.max()) + 1 if sg.size and sg.max() >= 0 else 1
        self.sh = _Shapes(B, K, E, F, S, H, G, n_arcs, n_ent, n_fent, chunk)
        self.interpret = interpret
        # path/record ids are carried in f32; they stay exact below 2**24
        self.max_T = max_scan_T(dec)

        # ---- static tables -------------------------------------------------
        # extended entry table: each closure entry also carries its TARGET
        # arc's metadata so the frontier's meta planes refresh at insertion
        # without a second gather. cols: [arc, w_score, w_ac, seq, hmm,
        # ent_base, ent_fan, f_base, f_fan, olabel]
        ent = np.zeros((n_ent, 16), np.float32)
        if n_ent_real:
            a = np.asarray(ex.arc, np.int64)
            rp = np.asarray(ex.row_ptr, np.int64)
            frp = np.asarray(ex.frow_ptr, np.int64)
            ent[:n_ent_real, 0] = a
            ent[:n_ent_real, 1] = ex.w_score
            ent[:n_ent_real, 2] = ex.w_ac
            ent[:n_ent_real, 3] = ex.seq
            ent[:n_ent_real, 4] = np.asarray(art.arc_hmm)[a]
            ent[:n_ent_real, 5] = rp[a]
            ent[:n_ent_real, 6] = rp[a + 1] - rp[a]
            ent[:n_ent_real, 7] = frp[a]
            ent[:n_ent_real, 8] = frp[a + 1] - frp[a]
            ent[:n_ent_real, 9] = np.asarray(art.arc_olabel)[a]
        self.n_ent_real = max(n_ent_real, 1)

        # width 16 to match the entry table: a width-8 gather crashed the
        # Mosaic vector layout pass (bisect: scripts/pallas_bisect.py)
        ftab = np.zeros((n_fent, 16), np.float32)
        if n_fent_real:
            ftab[:n_fent_real, 0] = ex.f_score
            ftab[:n_fent_real, 1] = ex.f_lm
            ftab[:n_fent_real, 2] = ex.f_ac
            ftab[:n_fent_real, 3] = ex.f_seq
        self.n_fent_real = max(n_fent_real, 1)

        # topology rows: [trP (S*S), sg_mask (S)] per HMM, padded to a
        # 128-row multiple: collapsing (B, K, H) one-hots to (B*K, H) only
        # lowers when the minor dim is lane-aligned (Mosaic crashes on
        # vector_extract_strided_slice otherwise — see scripts/pallas_probe)
        Hp = _rup(H + 1, 128)  # row H = the dead-slot sentinel (all zero)
        self.Hp = Hp
        topo = np.zeros((Hp, S * S + S), np.float32)
        topo[:H, : S * S] = np.asarray(art.trP, np.float32).reshape(H, S * S)
        topo[:H, S * S:] = (sg >= 0).astype(np.float32)

        # Msel: (G, S*Hp) one-hot, s-major columns — hs = gmm_t @ Msel gives
        # hs[:, s*Hp + h] = gmm_t[:, state_gmm[h, s]] (0 where no GMM; those
        # states are masked by `emitting` exactly like the XLA path)
        msel = np.zeros((G, S * Hp), np.float32)
        for h in range(H):
            for s in range(S):
                g = sg[h, s]
                if g >= 0:
                    msel[g, s * Hp + h] = 1.0

        self.tabs = {
            "ent": jnp.asarray(ent),
            "ftab": jnp.asarray(ftab),
            "topo": jnp.asarray(topo),
            "msel": jnp.asarray(msel),
        }

        # ---- static initial carry (the t = -1 start-state expansion) ------
        carry0, rec0 = dec._init_carry()
        carry0 = jax.tree.map(np.asarray, carry0)
        self.rec0 = {k: np.asarray(v) for k, v in rec0.items()}
        fr = carry0["fr"]
        arc0 = np.asarray(fr["arc"], np.int64)  # (K,)
        am = np.asarray(art.arc_hmm)
        ao = np.asarray(art.arc_olabel)
        rp = np.asarray(ex.row_ptr, np.int64)
        frp = np.asarray(ex.frow_ptr, np.int64)
        alive = arc0 < n_arcs  # real arcs only; dead slots get zero meta
        sel = np.where(alive, arc0, 0)

        def plane(vals):
            return np.where(alive, np.asarray(vals, np.float64)[sel], 0.0)

        def bb(x):  # broadcast a (K,) plane to (B, K) f32
            return np.ascontiguousarray(
                np.broadcast_to(np.asarray(x, np.float32)[None, :], (B, K))
            )

        self.init = {
            "sc": np.ascontiguousarray(np.broadcast_to(
                np.asarray(fr["score"], np.float32).T[:, None, :], (S, B, K))),
            "ac": np.ascontiguousarray(np.broadcast_to(
                np.asarray(fr["ac"], np.float32).T[:, None, :], (S, B, K))),
            "pa": np.ascontiguousarray(np.broadcast_to(
                np.asarray(fr["path"], np.float32).T[:, None, :], (S, B, K))),
            "arc": bb(arc0),
            "hmm": bb(np.where(alive, am[sel], H)),
            "ol": bb(plane(ao)),
            "eb": bb(plane(rp[:-1])),
            "ef": bb(plane(np.diff(rp))),
            "fb": bb(plane(frp[:-1])),
            "ff": bb(plane(np.diff(frp))),
            "best_emit": np.full((B, 1), np.float32(carry0["best_emit"])),
            "best_start": np.full((B, 1), np.float32(carry0["best_start"])),
            "norm": np.full((B, 1), np.float32(carry0["norm"])),
            "ovf": np.full(
                (B, 1), 1.0 if bool(carry0["overflow"]) else 0.0, np.float32
            ),
        }
        self.init = {k: jnp.asarray(v) for k, v in self.init.items()}
        self._carry_keys = list(self.init.keys())
        self._call = None

    # ------------------------------------------------------------------
    # kernel
    # ------------------------------------------------------------------

    def _kernel(self, tbase_ref, scores_ref, topo_ref, msel_ref, ent_ref,
                f_ref, *refs):
        from jax.experimental import pallas as pl

        sh = self.sh
        cfg = self.dec.cfg
        B, K, E, F, S, H = sh.B, sh.K, sh.E, sh.F, sh.S, sh.H
        NG = B // 8
        nck = len(self._carry_keys)
        cin = dict(zip(self._carry_keys, refs[:nck]))
        cout = dict(zip(self._carry_keys, refs[nck:2 * nck]))
        outs = dict(zip(_REC_NAMES, refs[2 * nck:2 * nck + 15]))
        (exsc_s, exac_s, expa_s, fanw_s, offs_s, live_s, arcc_s,
         ffan_s, foff_s, land_s, got_s,
         total_s, nliv_s, ftot_s, bent_s, ovf2_s,
         bfsc_s, bfac_s, bfpa_s, bfsq_s, bfsr_s) = refs[2 * nck + 15:]

        t_in_chunk = pl.program_id(0)
        dead = float(sh.n_arcs + 1)

        # chunk start: carry flows in through the input refs
        @pl.when(t_in_chunk == 0)
        def _():
            for k in self._carry_keys:
                cout[k][...] = cin[k][...]

        t = tbase_ref[0, 0] + t_in_chunk

        # ---- scalars -------------------------------------------------------
        best_emit = cout["best_emit"][...]  # (B, 1)
        normalise = jnp.where(best_emit > NEG / 2, best_emit, 0.0)
        norm = cout["norm"][...] + normalise
        cout["norm"][...] = norm

        if cfg.emit_prune_win > 0.0:
            emit_thresh = jnp.full((B, 1), -cfg.emit_prune_win, jnp.float32)
        else:
            emit_thresh = jnp.full((B, 1), NEG, jnp.float32)
        if cfg.phone_start_prune_win > 0.0:
            start_thresh = cout["best_start"][...] - cfg.phone_start_prune_win
        else:
            start_thresh = jnp.full((B, 1), NEG, jnp.float32)
        if self.debug_stage == 1:
            return

        # ---- internal propagation (HMMInternalPropagation) -----------------
        sc = [cout["sc"][s] for s in range(S)]
        ac = [cout["ac"][s] for s in range(S)]
        pa = [cout["pa"][s] for s in range(S)]
        sc[0] = jnp.where(sc[0] < start_thresh, NEG, sc[0])

        arc = cout["arc"][...]
        hmm = cout["hmm"][...]
        deadm = arc > sh.n_arcs + 0.5

        # per-slot topology rows: exact one-hot matmul (B*K, Hp) @ (Hp, .)
        Hp = self.Hp
        oh3 = (hmm[:, :, None] == _fiota((B, K, Hp), 2)).astype(jnp.float32)
        rows = jnp.dot(
            oh3.reshape(B * K, Hp), topo_ref[...],
            preferred_element_type=jnp.float32, precision=HI,
        ).reshape(B, K, S * S + S)

        # per-frame per-HMM-state GMM scores: gmm_t @ Msel (exact one-hot)
        gmm_t = scores_ref[0]
        hs = jnp.dot(gmm_t, msel_ref[...], preferred_element_type=jnp.float32,
                     precision=HI)  # (B, S*Hp)

        def trp(i, j):
            return jnp.where(deadm, NEG, rows[:, :, i * S + j])

        emitting = [rows[:, :, S * S + s] > 0.5 for s in range(S)]
        outp = [
            jnp.sum(oh3 * hs[:, s * Hp:(s + 1) * Hp][:, None, :], axis=2)
            for s in range(S)
        ]

        new_score, new_ac, new_pa = [], [], []
        for j in range(S):
            ms = [sc[i] + trp(i, j) for i in range(S)]
            mx = ms[0]
            for i in range(1, S):
                mx = jnp.maximum(mx, ms[i])
            # first-max select (jnp.argmax tie semantics)
            aj = jnp.zeros((B, K), jnp.float32)
            pj = jnp.zeros((B, K), jnp.float32)
            taken = jnp.zeros((B, K), bool)
            for i in range(S):
                sel = (ms[i] == mx) & ~taken
                taken = taken | sel
                aj = jnp.where(sel, ac[i] + trp(i, j), aj)
                pj = jnp.where(sel, pa[i], pj)
            new_score.append(mx)
            new_ac.append(aj)
            new_pa.append(pj)

        score2, ac2, pa2 = [], [], []
        best_emit_new = jnp.full((B, 1), NEG, jnp.float32)
        for s in range(S):
            ns = new_score[s] - normalise
            pass_emit = emitting[s] & (ns > emit_thresh) & (new_score[s] > NEG / 2)
            es = jnp.where(pass_emit, ns + outp[s], NEG)
            ea = jnp.where(pass_emit, new_ac[s] + outp[s], NEG)
            ep = jnp.where(pass_emit, new_pa[s], -1.0)
            best_emit_new = jnp.maximum(
                best_emit_new, jnp.max(es, axis=1, keepdims=True)
            )
            score2.append(jnp.where(emitting[s], es, NEG))
            ac2.append(jnp.where(emitting[s], ea, NEG))
            pa2.append(jnp.where(emitting[s], ep, -1.0))
        if self.debug_stage == 2:
            exsc_s[...] = score2[0]
            return

        # exit state: first-max over j of score2 + trP[j, S-1]
        exit_cand = [
            jnp.where(emitting[j], score2[j], NEG) + trp(j, S - 1)
            for j in range(S)
        ]
        exit_score = exit_cand[0]
        for j in range(1, S):
            exit_score = jnp.maximum(exit_score, exit_cand[j])
        exit_ac = jnp.zeros((B, K), jnp.float32)
        exit_pa = jnp.full((B, K), -1.0, jnp.float32)
        taken = jnp.zeros((B, K), bool)
        for j in range(S):
            sel = (exit_cand[j] == exit_score) & ~taken
            taken = taken | sel
            exit_ac = jnp.where(sel, ac2[j] + trp(j, S - 1), exit_ac)
            exit_pa = jnp.where(sel, pa2[j], exit_pa)
        exit_ok = exit_score > NEG / 2
        exit_score = jnp.where(exit_ok, exit_score, NEG)
        exit_ac = jnp.where(exit_ok, exit_ac, NEG)
        exit_pa = jnp.where(exit_ok, exit_pa, -1.0)
        best_end = jnp.max(exit_score, axis=1, keepdims=True)

        # ---- external propagation thresholds -------------------------------
        if cfg.phone_end_prune_win > 0.0:
            end_thresh = best_end - cfg.phone_end_prune_win
        else:
            end_thresh = jnp.full((B, 1), NEG, jnp.float32)
        if cfg.word_prune_win > 0.0:
            word_thresh = best_end - cfg.word_prune_win
        else:
            word_thresh = jnp.full((B, 1), NEG, jnp.float32)
        ol = cout["ol"][...]
        thresh_k = jnp.where(ol == 0.0, end_thresh, word_thresh)
        live_exit = exit_ok & (exit_score > thresh_k) & ~deadm

        # liveness for the merge (states 0..S-2 post-internal)
        live = jnp.zeros((B, K), bool)
        for s in range(S - 1):
            live = live | (score2[s] > NEG / 2)
        live = live & ~deadm
        arc_cur = jnp.where(live, arc, dead)
        n_live = jnp.sum(live.astype(jnp.float32), axis=1, keepdims=True)

        # entry/final expansion offsets (exclusive prefix over lanes)
        fan = jnp.where(live_exit, cout["ef"][...], 0.0)
        incl = _cumsum_lanes(fan, K)
        offs = incl - fan
        total = jnp.max(incl, axis=1, keepdims=True)
        ffan = jnp.where(live_exit, cout["ff"][...], 0.0)
        fincl = _cumsum_lanes(ffan, K)
        foffs = fincl - ffan
        ftotal = jnp.max(fincl, axis=1, keepdims=True)

        # stage-A results -> scratch for the grouped stage
        exsc_s[...] = exit_score
        exac_s[...] = exit_ac
        expa_s[...] = exit_pa
        fanw_s[...] = fan
        offs_s[...] = offs
        live_s[...] = live.astype(jnp.float32)
        arcc_s[...] = arc_cur
        ffan_s[...] = ffan
        foff_s[...] = foffs
        # per-utterance scalars live in individual (B, 1) scratch refs —
        # a packed (B, 16) buffer filled by minor-dim concatenate of (B, 1)
        # columns crashes the Mosaic lowering (limits 16 vs dim 1)
        total_s[...] = total
        nliv_s[...] = n_live
        ftot_s[...] = ftotal
        if self.debug_stage == 3:
            return

        tf = t.astype(jnp.float32)
        eb_ref = cout["eb"]
        fb_ref = cout["fb"]

        # ---- grouped stage: expansion + finals + merge + insertion --------
        def group(g, _):
            sl = pl.ds(pl.multiple_of(g * 8, 8), 8)
            ex_sc = exsc_s[sl, :]
            ex_ac = exac_s[sl, :]
            ex_pa = expa_s[sl, :]
            fan_g = fanw_s[sl, :]
            offs_g = offs_s[sl, :]
            live_g = live_s[sl, :] > 0.5
            arc_g = arcc_s[sl, :]
            norm_g = cout["norm"][sl, :]
            total_g = total_s[sl, :]
            nliv_g = nliv_s[sl, :]
            ftot_g = ftot_s[sl, :]

            # --- candidate source routing (the segment broadcast) ---
            e_io = _fiota((8, K, E), 2)
            k_io = _fiota((8, K, E), 1)
            m3 = (offs_g[:, :, None] <= e_io) & (fan_g[:, :, None] > 0.5)
            src = jnp.max(jnp.where(m3, k_io + 1.0, 0.0), axis=1) - 1.0
            oh_src = src[:, None, :] == k_io  # (8, K, E)

            def bcast(field):  # (8, K) -> (8, E)
                return jnp.sum(
                    jnp.where(oh_src, field[:, :, None], 0.0), axis=1
                )

            s_score = bcast(ex_sc)
            s_ac = bcast(ex_ac)
            s_pa = bcast(ex_pa)
            s_base = bcast(eb_ref[sl, :])
            s_fan = bcast(fan_g)
            s_offs = bcast(offs_g)
            e_i = _fiota((8, E), 1)
            within = e_i - s_offs
            valid = (src >= 0.0) & (e_i < total_g) & (within < s_fan)
            ent_idx = jnp.clip(s_base + within, 0.0, self.n_ent_real - 1.0)
            if self.debug_stage == 4:
                bent_s[sl, :] = jnp.max(
                    valid.astype(jnp.float32) + ent_idx, axis=1, keepdims=True
                )
                return 0

            # --- entry-table gather: exact chunked one-hot matmul ---
            erow = _gather_rows(ent_idx, ent_ref, sh.n_ent, 16)

            cand_arc = jnp.where(valid, erow[:, :, 0], 0.0)
            cand_score = jnp.where(valid, s_score + erow[:, :, 1], NEG)
            cand_ac = s_ac + erow[:, :, 2]
            cand_seq = erow[:, :, 3]
            valid = valid & (cand_score > NEG / 2)
            if self.debug_stage == 5:
                bent_s[sl, :] = jnp.max(cand_score, axis=1, keepdims=True)
                return 0

            # --- finals (this frame's bestFinalToken) ---
            # fresh iotas, NOT e_io[:, :, :F]: a minor-dim strided slice of
            # the (8, K, E) iota crashes the Mosaic vector layout pass
            e_iof = _fiota((8, K, F), 2)
            k_iof = _fiota((8, K, F), 1)
            foffs_g = foff_s[sl, :]
            ffan_g = ffan_s[sl, :]
            fm3 = (foffs_g[:, :, None] <= e_iof) & (ffan_g[:, :, None] > 0.5)
            fsrc = jnp.max(jnp.where(fm3, k_iof + 1.0, 0.0), axis=1) - 1.0
            oh_fsrc = fsrc[:, None, :] == k_iof

            def fbcast(field):
                return jnp.sum(
                    jnp.where(oh_fsrc, field[:, :, None], 0.0), axis=1
                )

            fs_score = fbcast(ex_sc)
            fs_ac = fbcast(ex_ac)
            fs_pa = fbcast(ex_pa)
            fs_base = fbcast(fb_ref[sl, :])
            fs_fan = fbcast(ffan_g)
            fs_offs = fbcast(foffs_g)
            f_i = _fiota((8, F), 1)
            fwithin = f_i - fs_offs
            fvalid = (fsrc >= 0.0) & (f_i < ftot_g) & (fwithin < fs_fan)
            fent = jnp.clip(fs_base + fwithin, 0.0, self.n_fent_real - 1.0)
            frow = _gather_rows(fent, f_ref, sh.n_fent, 16)
            fsc = jnp.where(fvalid, fs_score + frow[:, :, 0], NEG)
            fac = fs_ac + frow[:, :, 2]
            fmx = jnp.max(fsc, axis=1, keepdims=True)
            ffirst = jnp.min(
                jnp.where(fsc == fmx, f_i, float(F)), axis=1, keepdims=True
            )
            foh = f_i == ffirst

            def fpick(x):
                return jnp.sum(jnp.where(foh, x, 0.0), axis=1, keepdims=True)

            fs_arc = fbcast(arc_g)
            bf_sc = fpick(fsc)
            bf_ac = fpick(fac)
            bf_pa = fpick(fs_pa)
            bf_sq = fpick(frow[:, :, 3])
            bf_sr = fpick(fs_arc)
            fbetter = bf_sc > NEG
            bf_sc = jnp.where(fbetter, bf_sc, NEG)
            bf_ac = jnp.where(fbetter, bf_ac, NEG)
            bf_pa = jnp.where(fbetter, bf_pa, -1.0)
            bf_sq = jnp.where(fbetter, bf_sq, 0.0)
            bf_sr = jnp.where(fbetter, bf_sr, -1.0)
            if self.debug_stage == 6:
                bent_s[sl, :] = bf_sc
                return 0

            # --- merge: dense (E, E) segment argmax at original positions ---
            ck = jnp.where(valid, cand_arc, dead)
            gsc = jnp.where(valid, cand_score, NEG)
            ei = _fiota((8, E, E), 1)
            ej = _fiota((8, E, E), 2)
            # bool minor-dim inserts are unsupported by Mosaic ("Insertion
            # of minor dim that is not a no-op only supported for 32-bit
            # types") — broadcast masks through f32 instead
            validf = valid.astype(jnp.float32)
            same = (
                (validf[:, :, None] * validf[:, None, :] > 0.5)
                & (ck[:, :, None] == ck[:, None, :])
            )
            beats = same & (
                (gsc[:, :, None] > gsc[:, None, :])
                | ((gsc[:, :, None] == gsc[:, None, :]) & (ei < ej))
            )
            winner = valid & ~jnp.any(beats, axis=1)
            if self.debug_stage == 7:
                bent_s[sl, :] = jnp.sum(
                    winner.astype(jnp.float32), axis=1, keepdims=True
                )
                return 0

            # --- slot routing ---
            kk = _fiota((8, E, K), 2)
            winnerf = winner.astype(jnp.float32)
            live_gf = live_g.astype(jnp.float32)
            matchm = (
                (winnerf[:, :, None] * live_gf[:, None, :] > 0.5)
                & (ck[:, :, None] == arc_g[:, None, :])
            )
            hit = jnp.any(matchm, axis=2)
            slot_hit = jnp.sum(jnp.where(matchm, kk, 0.0), axis=2)
            need_new = winner & ~hit
            nn = need_new.astype(jnp.float32)
            new_rank = _cumsum_lanes(nn, E) - nn
            n_free = float(K) - nliv_g
            ovf_m = jnp.max(
                jnp.where(need_new & (new_rank >= n_free), 1.0, 0.0),
                axis=1, keepdims=True,
            )
            freeg = 1.0 - live_g.astype(jnp.float32)
            fr_rank = _cumsum_lanes(freeg, K) - freeg
            ohm = (
                (nn[:, :, None] * freeg[:, None, :] > 0.5)
                & (new_rank[:, :, None] == fr_rank[:, None, :])
            )
            slot_new = jnp.sum(jnp.where(ohm, kk, 0.0), axis=2)
            slot = jnp.where(
                hit, slot_hit,
                jnp.where(need_new & (new_rank < n_free), slot_new, -1.0),
            )
            w_ok = winner & (slot >= 0.0) & (slot < K)
            slot_w = jnp.where(w_ok, slot, float(K))

            # --- insertion: the scatter becomes a unique one-hot reduce ---
            oh_land = (
                (w_ok.astype(jnp.float32)[:, :, None] > 0.5)
                & (slot_w[:, :, None] == kk)
            )
            rec_id = tf * K + slot_w
            has_seq = cand_seq != 0.0
            entry_path = jnp.where(has_seq, rec_id, s_pa)
            g_lm = gsc - cand_ac + norm_g

            s_arc = bcast(arc_g)  # candidate source arc (for traceback
            #                        crossing-time word decomposition)
            cols = [
                ck, gsc, cand_ac, g_lm, entry_path, s_pa, cand_seq,
                has_seq.astype(jnp.float32),
                erow[:, :, 4], erow[:, :, 5], erow[:, :, 6],
                erow[:, :, 7], erow[:, :, 8], erow[:, :, 9],
                s_arc,
            ]
            for c, colv in enumerate(cols):
                land_s[c, sl, :] = jnp.sum(
                    jnp.where(oh_land, colv[:, :, None], 0.0), axis=1
                )
            got_s[sl, :] = jnp.any(oh_land, axis=1).astype(jnp.float32)

            best_entry = jnp.max(
                jnp.where(w_ok, gsc, NEG), axis=1, keepdims=True
            )
            ovf = jnp.maximum(
                jnp.maximum(ovf_m, jnp.where(total_g > E, 1.0, 0.0)),
                jnp.where(ftot_g > F, 1.0, 0.0),
            )
            bent_s[sl, :] = best_entry
            ovf2_s[sl, :] = ovf
            bfsc_s[sl, :] = bf_sc
            bfac_s[sl, :] = bf_ac
            bfpa_s[sl, :] = bf_pa
            bfsq_s[sl, :] = bf_sq
            bfsr_s[sl, :] = bf_sr
            return 0

        jax.lax.fori_loop(0, NG, group, 0)
        if 4 <= self.debug_stage <= 8:
            return

        # ---- apply landed winners (full-B) ---------------------------------
        got = got_s[...] > 0.5
        land = [land_s[c] for c in range(15)]
        cout["arc"][...] = jnp.where(got, land[0], arcc_s[...])
        cout["hmm"][...] = jnp.where(
            got, land[8], jnp.where(live, hmm, float(H))
        )
        cout["eb"][...] = jnp.where(got, land[9], eb_ref[...])
        cout["ef"][...] = jnp.where(got, land[10], cout["ef"][...])
        cout["fb"][...] = jnp.where(got, land[11], fb_ref[...])
        cout["ff"][...] = jnp.where(got, land[12], cout["ff"][...])
        cout["ol"][...] = jnp.where(got, land[13], ol)

        cout["sc"][0] = jnp.where(got, land[1], NEG)
        cout["ac"][0] = jnp.where(got, land[2], NEG)
        cout["pa"][0] = jnp.where(got, land[4], -1.0)
        for s in range(1, S):
            cout["sc"][s] = score2[s]
            cout["ac"][s] = ac2[s]
            cout["pa"][s] = pa2[s]

        best_entry = bent_s[...]
        cout["best_emit"][...] = jnp.maximum(best_emit_new, best_entry)
        cout["best_start"][...] = best_entry
        cout["ovf"][...] = jnp.maximum(cout["ovf"][...], ovf2_s[...])

        # ---- per-frame outputs ---------------------------------------------
        rec_valid = got & (land[7] > 0.5)
        outs["rec_prev"][...] = jnp.where(
            rec_valid, land[5], -1.0
        ).astype(jnp.int32)[None]
        outs["rec_seq"][...] = jnp.where(
            rec_valid, land[6], 0.0
        ).astype(jnp.int32)[None]
        outs["rec_score"][...] = jnp.where(rec_valid, land[1], NEG)[None]
        outs["rec_ac"][...] = jnp.where(rec_valid, land[2], NEG)[None]
        outs["rec_lm"][...] = jnp.where(rec_valid, land[3], NEG)[None]
        outs["rec_src"][...] = jnp.where(
            rec_valid, land[14], -1.0
        ).astype(jnp.int32)[None]
        outs["rec_arc"][...] = jnp.where(
            rec_valid, land[0], -1.0
        ).astype(jnp.int32)[None]
        # per-utterance frame outputs are (C, 1, B): Mosaic requires the
        # block's second-to-last dim to divide 8 or equal the array's, so a
        # singleton sublane dim stands between the frame and lane axes
        bf_sc_all = bfsc_s[...]
        bf_ac_all = bfac_s[...]
        outs["bf_score"][...] = bf_sc_all.reshape(1, 1, B)
        outs["bf_ac"][...] = bf_ac_all.reshape(1, 1, B)
        outs["bf_lm"][...] = jnp.where(
            bf_sc_all > NEG / 2, bf_sc_all - bf_ac_all + norm, NEG
        ).reshape(1, 1, B)
        outs["bf_path"][...] = bfpa_s[...].astype(jnp.int32).reshape(1, 1, B)
        outs["bf_seq"][...] = bfsq_s[...].astype(jnp.int32).reshape(1, 1, B)
        outs["bf_src"][...] = bfsr_s[...].astype(jnp.int32).reshape(1, 1, B)
        outs["n_active"][...] = jnp.sum(
            (live | got).astype(jnp.int32), axis=1
        ).reshape(1, 1, B)
        outs["n_cand"][...] = total_s[...].astype(jnp.int32).reshape(1, 1, B)

    # ------------------------------------------------------------------
    # chunk wrapper
    # ------------------------------------------------------------------

    def _build_call(self):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        sh = self.sh
        B, K = sh.B, sh.K
        C = sh.chunk
        f32, i32 = jnp.float32, jnp.int32

        out_shape = (
            [jax.ShapeDtypeStruct(self.init[k].shape, f32)
             for k in self._carry_keys]
            + [jax.ShapeDtypeStruct((C, B, K), i32),
               jax.ShapeDtypeStruct((C, B, K), i32),
               jax.ShapeDtypeStruct((C, B, K), f32),
               jax.ShapeDtypeStruct((C, B, K), f32),
               jax.ShapeDtypeStruct((C, B, K), f32),
               jax.ShapeDtypeStruct((C, B, K), i32),
               jax.ShapeDtypeStruct((C, B, K), i32)]
            + [jax.ShapeDtypeStruct((C, 1, B), f32)] * 3
            + [jax.ShapeDtypeStruct((C, 1, B), i32)] * 3
            + [jax.ShapeDtypeStruct((C, 1, B), i32)] * 2
        )

        def const_spec(shape):
            nd = len(shape)
            return pl.BlockSpec(shape, lambda t, nd=nd: (0,) * nd)

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),            # tbase (1,1)
            pl.BlockSpec((1, B, sh.G), lambda t: (t, 0, 0)),  # scores
            const_spec(self.tabs["topo"].shape),
            const_spec(self.tabs["msel"].shape),
            const_spec(self.tabs["ent"].shape),
            const_spec(self.tabs["ftab"].shape),
        ] + [const_spec(self.init[k].shape) for k in self._carry_keys]

        out_specs = (
            [const_spec(self.init[k].shape) for k in self._carry_keys]
            + [pl.BlockSpec((1, B, K), lambda t: (t, 0, 0))] * 7
            + [pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0))] * 8
        )

        scratch = [
            pltpu.VMEM((B, K), f32),       # exit score
            pltpu.VMEM((B, K), f32),       # exit ac
            pltpu.VMEM((B, K), f32),       # exit path
            pltpu.VMEM((B, K), f32),       # fan
            pltpu.VMEM((B, K), f32),       # offs
            pltpu.VMEM((B, K), f32),       # live
            pltpu.VMEM((B, K), f32),       # arc_cur
            pltpu.VMEM((B, K), f32),       # final fan
            pltpu.VMEM((B, K), f32),       # final offs
            pltpu.VMEM((15, B, K), f32),   # landed payload columns
            pltpu.VMEM((B, K), f32),       # got
        ] + [pltpu.VMEM((B, 1), f32)] * 10  # per-utterance scalars: total,
        #   n_live, ftotal, best_entry, ovf, bf score/ac/path/seq/src

        call = pl.pallas_call(
            self._kernel,
            grid=(C,),
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
            interpret=self.interpret,
            # the frame step's live set (routing masks + merge compares +
            # gather one-hots) tops out above Mosaic's default 16M scoped
            # budget; v5e has 128M physical VMEM per core
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )

        tabs = self.tabs
        nck = len(self._carry_keys)

        def run_chunks(carry, scores, t0):
            """scores (T, B, n_gmms) with T % chunk == 0."""
            scores = scores[:, :, :sh.G].astype(jnp.float32)
            T = scores.shape[0]
            n_chunks = T // C

            def step(cr, xs):
                sc_chunk, tbase = xs
                res = call(tbase, sc_chunk, tabs["topo"], tabs["msel"],
                           tabs["ent"], tabs["ftab"],
                           *[cr[k] for k in self._carry_keys])
                ncar = dict(zip(self._carry_keys, res[:nck]))
                return ncar, res[nck:]

            tbases = (
                t0 + C * jnp.arange(n_chunks, dtype=jnp.int32)
            ).reshape(n_chunks, 1, 1)
            scores = scores.reshape(n_chunks, C, B, sh.G)
            carry, ys = jax.lax.scan(step, carry, (scores, tbases))
            out = {}
            for n, y in zip(_REC_NAMES, ys):
                y = y.reshape((n_chunks * C,) + y.shape[2:])
                if y.ndim == 3 and y.shape[1] == 1:  # (T, 1, B) -> (T, B)
                    y = y[:, 0, :]
                out[n] = y
            return carry, out

        self._run = run_chunks
        return jax.jit(run_chunks)

    def run_fn(self):
        """The unjitted (carry, scores, t0) -> (carry, ys) runner, for
        composing under an outer jit / shard_map (each shard runs its own
        B-sized kernel; the batch axis never crosses the kernel)."""
        if self._call is None:
            self._call = self._build_call()
        return self._run

    def __call__(self, scores, carry=None, t0=0):
        """Run the fused scan. scores: (T, B, n_gmms), T % chunk == 0.
        Returns (carry, ys); ys fields match the XLA scan's diagnostics."""
        if self._call is None:
            self._call = self._build_call()
        T = scores.shape[0]
        if T % self.sh.chunk:
            raise ValueError("T must be a multiple of the chunk size")
        if int(t0) + T > self.max_T:
            raise ValueError("utterance too long for f32 record ids")
        if carry is None:
            carry = dict(self.init)
        return self._call(carry, scores, jnp.int32(t0))


def assemble_results(dec: TpuDecoder, ps: PallasDecodeScan, carry, ys,
                     lengths):
    """Convert a fused-scan batch output into per-utterance DecodeResults,
    reading each utterance's best-final snapshot at its true length (the
    exact padded-batch semantics of TpuDecoder.decode_scores)."""
    rec = {k: np.asarray(v) for k, v in ys.items()}
    ovf = np.asarray(carry["ovf"])[:, 0] > 0.5
    results = []
    for i, L in enumerate(lengths):
        L = int(L)
        bf = {
            "score": rec["bf_score"][L - 1, i],
            "ac": rec["bf_ac"][L - 1, i],
            "lm": rec["bf_lm"][L - 1, i],
            "path": rec["bf_path"][L - 1, i],
            "seq": rec["bf_seq"][L - 1, i],
            "src": rec["bf_src"][L - 1, i],
        }
        carry_i = {"best_final": bf, "overflow": ovf[i]}
        ys_i = {
            k: rec[k][:, i]
            for k in ["rec_prev", "rec_seq", "rec_score", "rec_ac", "rec_lm",
                      "rec_src", "rec_arc", "n_active", "n_cand"]
        }
        results.append(dec._traceback(carry_i, ys_i, ps.rec0, L))
    return results
