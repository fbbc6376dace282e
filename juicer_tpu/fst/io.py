"""AT&T-format text FSM / symbol-table IO.

Format per the reference writers (`/root/reference/src/WFSTGeneral.h:36-61`):
  arc line:   "from to in out [weight]"
  final line: "state [weight]"
  symbols:    "%-25s %d" per line
The initial state is the source state of the first arc line
(`/root/reference/src/WFSTNetwork.cpp:453`).
"""

from __future__ import annotations

from typing import Optional, TextIO, Union

from .fst import Fst, SymbolTable
from .semiring import LOG, Semiring


def read_fsm(
    path_or_file: Union[str, TextIO],
    semiring: Semiring = LOG,
    isyms: Optional[SymbolTable] = None,
    osyms: Optional[SymbolTable] = None,
    use_native: bool = True,
) -> Fst:
    close = False
    if isinstance(path_or_file, str):
        if use_native:
            f = _read_fsm_native(path_or_file, semiring, isyms, osyms)
            if f is not None:
                return f
        fd = open(path_or_file, "r")
        close = True
    else:
        fd = path_or_file
    try:
        f = Fst(semiring)
        f.isyms, f.osyms = isyms, osyms
        for line in fd:
            parts = line.split()
            if not parts:
                continue
            try:
                if len(parts) >= 4:
                    src, dst, il, ol = (int(x) for x in parts[:4])
                    w = float(parts[4]) if len(parts) >= 5 else 0.0
                    if f.start < 0:
                        f.set_start(src)
                    f.add_arc(src, dst, il, ol, w)
                elif len(parts) == 1:
                    f.set_final(int(parts[0]), 0.0)
                else:
                    f.set_final(int(parts[0]), float(parts[1]))
            except ValueError:
                continue  # invalid line: skip, like the reference loader
        return f
    finally:
        if close:
            fd.close()


def _read_fsm_native(path: str, semiring, isyms, osyms) -> Optional[Fst]:
    """Fast path: parse with the native library (native/jtpu_native.cpp)."""
    try:
        from ..native import parse_fsm
    except ImportError:
        return None
    out = parse_fsm(path)
    if out is None:
        return None
    src, dst, il, ol, w, fs, fw, init_state = out
    f = Fst(semiring)
    f.isyms, f.osyms = isyms, osyms
    f.arc_src = src.tolist()
    f.arc_dst = dst.tolist()
    f.arc_ilabel = il.tolist()
    f.arc_olabel = ol.tolist()
    f.arc_weight = w.tolist()
    n = 0
    if len(src):
        n = int(max(src.max(), dst.max())) + 1
    if len(fs):
        n = max(n, int(fs.max()) + 1)
    f.num_states = n
    f.start = init_state
    f.finals = {int(s): float(x) for s, x in zip(fs, fw)}
    return f


def write_fsm(f: Fst, path_or_file: Union[str, TextIO]) -> None:
    close = False
    if isinstance(path_or_file, str):
        fd = open(path_or_file, "w")
        close = True
    else:
        fd = path_or_file
    try:
        n = f.num_arcs
        # Arc lines: the FIRST line's source must be the initial state so
        # the loader identifies it correctly. If insertion order already
        # starts at the start state (true for all the generators, which
        # emit chains from the initial state), keep it untouched — the
        # reference tools write arcs in emission order and the
        # cross-check diffs are byte-exact. Otherwise stable-sort the
        # start state's arcs to the front.
        order = list(range(n))
        if f.start >= 0 and n > 0 and f.arc_src[0] != f.start:
            order.sort(key=lambda i: (f.arc_src[i] != f.start,))
        for i in order:
            w = f.arc_weight[i]
            if w == 0.0:
                fd.write(f"{f.arc_src[i]} {f.arc_dst[i]} {f.arc_ilabel[i]} {f.arc_olabel[i]}\n")
            else:
                fd.write(
                    f"{f.arc_src[i]} {f.arc_dst[i]} {f.arc_ilabel[i]} "
                    f"{f.arc_olabel[i]} {w:.3f}\n"
                )
        for s in sorted(f.finals):
            w = f.finals[s]
            if w == 0.0:
                fd.write(f"{s}\n")
            else:
                fd.write(f"{s} {w:f}\n")
    finally:
        if close:
            fd.close()


def read_symbols(path_or_file: Union[str, TextIO]) -> SymbolTable:
    close = False
    if isinstance(path_or_file, str):
        fd = open(path_or_file, "r")
        close = True
    else:
        fd = path_or_file
    try:
        t = SymbolTable()
        for line in fd:
            parts = line.split()
            if len(parts) != 2:
                continue
            sym, idx = parts[0], int(parts[1])
            # Exact duplicate bindings are tolerated silently. The only
            # tolerated CONFLICT is the reference's unconditional
            # "#sil 0 / #sp 1" trailer in lexgen output-symbol files
            # (`WFSTLexGen.cpp:566`), which collides with <eps>/word ids;
            # the reference never reloads these files, so ignore that
            # trailer but surface any other inconsistent binding instead
            # of silently accepting a corrupt symbol file.
            if t.find(sym) == idx:
                continue  # exact duplicate
            if 0 <= idx < len(t) and t[idx] is not None:
                if sym in ("#sil", "#sp"):
                    continue  # the known lexgen trailer
                raise ValueError(
                    f"symbol file conflict: {sym!r} -> {idx} but id {idx} "
                    f"is already {t[idx]!r}"
                )
            if t.find(sym) >= 0:
                raise ValueError(
                    f"symbol file conflict: {sym!r} bound to both "
                    f"{t.find(sym)} and {idx}"
                )
            t.add_with_index(sym, idx)
        return t
    finally:
        if close:
            fd.close()


def write_symbols(t: SymbolTable, path_or_file: Union[str, TextIO]) -> None:
    close = False
    if isinstance(path_or_file, str):
        fd = open(path_or_file, "w")
        close = True
    else:
        fd = path_or_file
    try:
        for i, s in enumerate(t):
            if s is not None:
                fd.write(f"{s:<25} {i}\n")
    finally:
        if close:
            fd.close()
