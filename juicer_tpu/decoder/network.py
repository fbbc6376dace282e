"""Runtime search-network representation.

Rebuild of `WFSTNetwork` load semantics
(`/root/reference/src/WFSTNetwork.cpp:371-618`):
  - FSM file weights are costs (negative log); internal arc weight is
    -cost * lmScaleFactor, plus the word insertion penalty when the arc has
    a non-eps output label (so higher = better and Viterbi is max-plus);
  - final-state weights likewise negated and scaled;
  - auxiliary symbols replaced by epsilon on load (REMOVEBOTH);
  - sil / sp input labels discovered for word-end pruning;
  - the initial state is the source of the first arc line.

Storage is numpy CSR (arcs sorted by source state) — the TPU artifact
consumes these arrays directly.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..fst import Fst, SymbolTable, read_fsm, read_symbols
from ..fst.fst import EPSILON

LOG_ZERO = -1e30


class DecoderNetwork:
    def __init__(
        self,
        fst: Fst,
        in_syms: Optional[SymbolTable] = None,
        out_syms: Optional[SymbolTable] = None,
        lm_scale: float = 1.0,
        ins_pen: float = 0.0,
        remove_aux: str = "both",  # both | input | none
    ):
        in_syms = in_syms if in_syms is not None else fst.isyms
        out_syms = out_syms if out_syms is not None else fst.osyms
        self.in_syms = in_syms
        self.out_syms = out_syms
        self.lm_scale = lm_scale
        self.ins_pen = ins_pen

        src, dst, il, ol, w = fst.arcs_numpy()
        # decoder-internal weights: higher = better
        weight = -w * lm_scale
        weight = np.where(ol > 0, weight + ins_pen, weight)

        # aux symbol removal
        if remove_aux in ("both", "input") and in_syms is not None:
            aux_in = np.array(
                [i > 0 and i < len(in_syms) and in_syms.is_auxiliary(i) for i in range(max(il.max(initial=0) + 1, 1))],
                dtype=bool,
            )
            il = np.where(aux_in[il], EPSILON, il)
        if remove_aux == "both" and out_syms is not None:
            aux_out = np.array(
                [i > 0 and i < len(out_syms) and out_syms.is_auxiliary(i) for i in range(max(ol.max(initial=0) + 1, 1))],
                dtype=bool,
            )
            ol = np.where(aux_out[ol], EPSILON, ol)

        # CSR by source state, preserving file arc order within a state
        order = np.argsort(src, kind="stable")
        self.arc_src = src[order].astype(np.int32)
        self.arc_dst = dst[order].astype(np.int32)
        self.arc_ilabel = il[order].astype(np.int32)
        self.arc_olabel = ol[order].astype(np.int32)
        self.arc_weight = weight[order].astype(np.float64)
        self.n_states = fst.num_states
        self.n_arcs = len(self.arc_src)
        self.row_ptr = np.zeros(self.n_states + 1, dtype=np.int64)
        np.add.at(self.row_ptr, self.arc_src + 1, 1)
        self.row_ptr = np.cumsum(self.row_ptr)

        self.init_state = fst.start
        self.final_weight = np.full(self.n_states, LOG_ZERO, dtype=np.float64)
        for s, fw in fst.finals.items():
            self.final_weight[s] = -fw * lm_scale

        # wordEndMarker = max(in,out) label + 1 (`WFSTNetwork.cpp:566-569`)
        max_in = int(self.arc_ilabel.max(initial=0))
        max_out = int(self.arc_olabel.max(initial=0))
        if in_syms is not None:
            max_in = max(max_in, len(in_syms) - 1)
        if out_syms is not None:
            max_out = max(max_out, len(out_syms) - 1)
        self.word_end_marker = max(max_in, max_out) + 1

        # sil / sp input labels for word-end pruning: the reference hardcodes
        # the literal strings "sil"/"sp" here regardless of the
        # -silMonophone/-pauseMonophone flags (`WFSTNetwork.cpp:605-616`;
        # those flags only feed PhoneLookup / model-level output)
        self.sil_marker = in_syms.find("sil") if in_syms is not None else -1
        self.sp_marker = in_syms.find("sp") if in_syms is not None else -1

    @classmethod
    def from_files(
        cls,
        fsm_fname: str,
        in_syms_fname: Optional[str] = None,
        out_syms_fname: Optional[str] = None,
        lm_scale: float = 1.0,
        ins_pen: float = 0.0,
        remove_aux: str = "both",
    ) -> "DecoderNetwork":
        isy = read_symbols(in_syms_fname) if in_syms_fname else None
        osy = read_symbols(out_syms_fname) if out_syms_fname else None
        f = read_fsm(fsm_fname)
        return cls(f, isy, osy, lm_scale, ins_pen, remove_aux)

    # -- queries -----------------------------------------------------------

    def out_arc_range(self, state: int) -> tuple[int, int]:
        return int(self.row_ptr[state]), int(self.row_ptr[state + 1])

    def arcs_from(self, state: int) -> range:
        a, b = self.out_arc_range(state)
        return range(a, b)

    def is_final(self, state: int) -> bool:
        return self.final_weight[state] > LOG_ZERO

    @property
    def max_out_degree(self) -> int:
        return int(np.max(self.row_ptr[1:] - self.row_ptr[:-1], initial=0))

    # -- binary cache ------------------------------------------------------

    def save_npz(self, path: str) -> None:
        np.savez_compressed(
            path,
            arc_src=self.arc_src,
            arc_dst=self.arc_dst,
            arc_ilabel=self.arc_ilabel,
            arc_olabel=self.arc_olabel,
            arc_weight=self.arc_weight,
            row_ptr=self.row_ptr,
            n_states=self.n_states,
            init_state=self.init_state,
            final_weight=self.final_weight,
            word_end_marker=self.word_end_marker,
            sil_marker=self.sil_marker,
            sp_marker=self.sp_marker,
            lm_scale=self.lm_scale,
            ins_pen=self.ins_pen,
        )

    @classmethod
    def load_npz(cls, path: str) -> "DecoderNetwork":
        z = np.load(path)
        net = cls.__new__(cls)
        net.in_syms = None
        net.out_syms = None
        for k in (
            "arc_src", "arc_dst", "arc_ilabel", "arc_olabel", "arc_weight",
            "row_ptr", "final_weight",
        ):
            setattr(net, k, z[k])
        net.n_states = int(z["n_states"])
        net.n_arcs = len(net.arc_src)
        net.init_state = int(z["init_state"])
        net.word_end_marker = int(z["word_end_marker"])
        net.sil_marker = int(z["sil_marker"])
        net.sp_marker = int(z["sp_marker"])
        net.lm_scale = float(z["lm_scale"])
        net.ins_pen = float(z["ins_pen"])
        return net
