"""ctypes bindings for the native runtime library (native/jtpu_native.cpp).

Builds the shared library on demand with g++ (cached beside the source,
rebuilt when the source is newer) and exposes:

  - parse_fsm(path): fast AT&T text FSM parsing -> numpy arrays
  - closure(...): the offline eps/tee closure expansion used by
    decoder/artifact.py
  - determinize(...): weighted subset construction (fst/algos.determinize
    twin) for the WSJ-scale offline pipeline

Falls back gracefully (returns None / raises ImportError) when no C++
toolchain is available; all callers keep a pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "jtpu_native.cpp")
_LIB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native_build")
_LIB = os.path.join(_LIB_DIR, "libjtpu_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


class _FsmResult(ctypes.Structure):
    _fields_ = [
        ("n_arcs", ctypes.c_int64),
        ("n_finals", ctypes.c_int64),
        ("init_state", ctypes.c_int32),
        ("max_state", ctypes.c_int32),
        ("src", ctypes.POINTER(ctypes.c_int32)),
        ("dst", ctypes.POINTER(ctypes.c_int32)),
        ("ilab", ctypes.POINTER(ctypes.c_int32)),
        ("olab", ctypes.POINTER(ctypes.c_int32)),
        ("weight", ctypes.POINTER(ctypes.c_double)),
        ("final_state", ctypes.POINTER(ctypes.c_int32)),
        ("final_weight", ctypes.POINTER(ctypes.c_double)),
    ]


class _ClosureResult(ctypes.Structure):
    _fields_ = [
        ("n_entries", ctypes.c_int64),
        ("ent_row_ptr", ctypes.POINTER(ctypes.c_int64)),
        ("ent_arc", ctypes.POINTER(ctypes.c_int32)),
        ("ent_wlm", ctypes.POINTER(ctypes.c_double)),
        ("ent_wac", ctypes.POINTER(ctypes.c_double)),
        ("ent_seq_off", ctypes.POINTER(ctypes.c_int64)),
        ("ent_seq_len", ctypes.POINTER(ctypes.c_int32)),
        ("n_finals", ctypes.c_int64),
        ("fin_row_ptr", ctypes.POINTER(ctypes.c_int64)),
        ("fin_wlm", ctypes.POINTER(ctypes.c_double)),
        ("fin_wac", ctypes.POINTER(ctypes.c_double)),
        ("fin_seq_off", ctypes.POINTER(ctypes.c_int64)),
        ("fin_seq_len", ctypes.POINTER(ctypes.c_int32)),
        ("n_labels", ctypes.c_int64),
        ("labels", ctypes.POINTER(ctypes.c_int32)),
    ]


class _DetResult(ctypes.Structure):
    _fields_ = [
        ("n_states", ctypes.c_int64),
        ("n_arcs", ctypes.c_int64),
        ("arc_src", ctypes.POINTER(ctypes.c_int32)),
        ("arc_dst", ctypes.POINTER(ctypes.c_int32)),
        ("arc_il", ctypes.POINTER(ctypes.c_int32)),
        ("arc_ostr", ctypes.POINTER(ctypes.c_int32)),
        ("arc_w", ctypes.POINTER(ctypes.c_double)),
        ("n_finals", ctypes.c_int64),
        ("fin_sid", ctypes.POINTER(ctypes.c_int32)),
        ("fin_ostr", ctypes.POINTER(ctypes.c_int32)),
        ("fin_w", ctypes.POINTER(ctypes.c_double)),
        ("n_strs", ctypes.c_int64),
        ("str_off", ctypes.POINTER(ctypes.c_int64)),
        ("str_len", ctypes.POINTER(ctypes.c_int32)),
        ("str_labels", ctypes.POINTER(ctypes.c_int32)),
        ("n_labels", ctypes.c_int64),
        ("error", ctypes.c_int32),
    ]


def _build() -> bool:
    os.makedirs(_LIB_DIR, exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=300,
        )
        return True
    except (OSError, subprocess.SubprocessError) as e:
        print(f"juicer_tpu.native: build failed ({e}); using pure-Python paths",
              file=sys.stderr)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.jtpu_parse_fsm.restype = ctypes.POINTER(_FsmResult)
        lib.jtpu_parse_fsm.argtypes = [ctypes.c_char_p]
        lib.jtpu_free_fsm.argtypes = [ctypes.POINTER(_FsmResult)]
        lib.jtpu_closure.restype = ctypes.POINTER(_ClosureResult)
        lib.jtpu_closure.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.int64),
            ctypes.c_int64,
        ]
        lib.jtpu_free_closure.argtypes = [ctypes.POINTER(_ClosureResult)]
        lib.jtpu_determinize.restype = ctypes.POINTER(_DetResult)
        lib.jtpu_determinize.argtypes = [
            ctypes.c_int64, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.float64),
            ctypes.c_int32, ctypes.c_int64,
        ]
        lib.jtpu_free_determinize.argtypes = [ctypes.POINTER(_DetResult)]
        _lib = lib
        return _lib


def _copy(ptr, n, dtype):
    if n == 0:
        return np.zeros(0, dtype=dtype)
    return np.ctypeslib.as_array(ptr, shape=(n,)).astype(dtype, copy=True)


def parse_fsm(path: str):
    """Returns (src, dst, il, ol, w, final_states, final_weights, init_state)
    or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rp = lib.jtpu_parse_fsm(path.encode())
    if not rp:
        raise IOError(f"jtpu_parse_fsm failed for {path}")
    r = rp.contents
    out = (
        _copy(r.src, r.n_arcs, np.int32),
        _copy(r.dst, r.n_arcs, np.int32),
        _copy(r.ilab, r.n_arcs, np.int32),
        _copy(r.olab, r.n_arcs, np.int32),
        _copy(r.weight, r.n_arcs, np.float64),
        _copy(r.final_state, r.n_finals, np.int32),
        _copy(r.final_weight, r.n_finals, np.float64),
        int(r.init_state),
    )
    lib.jtpu_free_fsm(rp)
    return out


def determinize(n_states, start, row_ptr, arc_dst, arc_il, arc_ol, arc_w,
                final_w, semiring: str, max_subsets=50_000_000):
    """Native weighted determinization. Returns a dict of numpy arrays
    (arcs with interned output-string ids + the string table) or None if
    the native library is unavailable. Raises RuntimeError on subset
    blow-up (mirrors the pure-Python guard)."""
    lib = get_lib()
    if lib is None:
        return None
    sr = {"tropical": 0, "log": 1}[semiring]
    rp = lib.jtpu_determinize(
        int(n_states), int(start),
        np.ascontiguousarray(row_ptr, np.int64),
        np.ascontiguousarray(arc_dst, np.int32),
        np.ascontiguousarray(arc_il, np.int32),
        np.ascontiguousarray(arc_ol, np.int32),
        np.ascontiguousarray(arc_w, np.float64),
        np.ascontiguousarray(final_w, np.float64),
        sr, int(max_subsets),
    )
    if not rp:
        raise RuntimeError("jtpu_determinize failed")
    r = rp.contents
    if r.error:
        lib.jtpu_free_determinize(rp)
        raise RuntimeError("determinize: subset blow-up (not determinizable?)")
    out = {
        "n_states": int(r.n_states),
        "arc_src": _copy(r.arc_src, r.n_arcs, np.int32),
        "arc_dst": _copy(r.arc_dst, r.n_arcs, np.int32),
        "arc_il": _copy(r.arc_il, r.n_arcs, np.int32),
        "arc_ostr": _copy(r.arc_ostr, r.n_arcs, np.int32),
        "arc_w": _copy(r.arc_w, r.n_arcs, np.float64),
        "fin_sid": _copy(r.fin_sid, r.n_finals, np.int32),
        "fin_ostr": _copy(r.fin_ostr, r.n_finals, np.int32),
        "fin_w": _copy(r.fin_w, r.n_finals, np.float64),
        "str_off": _copy(r.str_off, r.n_strs, np.int64),
        "str_len": _copy(r.str_len, r.n_strs, np.int32),
        "str_labels": _copy(r.str_labels, r.n_labels, np.int32),
    }
    lib.jtpu_free_determinize(rp)
    return out


def closure(n_states, row_ptr, arc_dst, arc_il, arc_ol, arc_w, final_w, tee,
            hmm_arc_index, max_entries_per_state=1_000_000):
    """Native eps/tee closure. Returns a dict of numpy arrays or None."""
    lib = get_lib()
    if lib is None:
        return None
    rp = lib.jtpu_closure(
        int(n_states),
        np.ascontiguousarray(row_ptr, np.int64),
        np.ascontiguousarray(arc_dst, np.int32),
        np.ascontiguousarray(arc_il, np.int32),
        np.ascontiguousarray(arc_ol, np.int32),
        np.ascontiguousarray(arc_w, np.float64),
        np.ascontiguousarray(final_w, np.float64),
        np.ascontiguousarray(tee, np.float64),
        np.ascontiguousarray(hmm_arc_index, np.int64),
        int(max_entries_per_state),
    )
    if not rp:
        raise RuntimeError("jtpu_closure failed (entry blow-up?)")
    r = rp.contents
    out = {
        "ent_row_ptr": _copy(r.ent_row_ptr, n_states + 1, np.int64),
        "ent_arc": _copy(r.ent_arc, r.n_entries, np.int32),
        "ent_wlm": _copy(r.ent_wlm, r.n_entries, np.float64),
        "ent_wac": _copy(r.ent_wac, r.n_entries, np.float64),
        "ent_seq_off": _copy(r.ent_seq_off, r.n_entries, np.int64),
        "ent_seq_len": _copy(r.ent_seq_len, r.n_entries, np.int32),
        "fin_row_ptr": _copy(r.fin_row_ptr, n_states + 1, np.int64),
        "fin_wlm": _copy(r.fin_wlm, r.n_finals, np.float64),
        "fin_wac": _copy(r.fin_wac, r.n_finals, np.float64),
        "fin_seq_off": _copy(r.fin_seq_off, r.n_finals, np.int64),
        "fin_seq_len": _copy(r.fin_seq_len, r.n_finals, np.int32),
        "labels": _copy(r.labels, r.n_labels, np.int32),
    }
    lib.jtpu_free_closure(rp)
    return out
