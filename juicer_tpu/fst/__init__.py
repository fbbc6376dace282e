"""Weighted finite-state transducer library.

A self-contained WFST toolkit covering every operation the reference build
pipeline gets from an external FST toolkit (`/root/reference/bin/build-wfst-openfst:99-180`):
compile/print (AT&T text format), arcsort, closure, connect, invert, compose,
epsilon-normalization, rmepsilon, determinize (weighted, with output-string
residuals for transducers), encode/minimize/decode, and weight pushing — in
the tropical or log semiring.

Weights here are *costs* (negative natural-log probabilities), matching the
on-disk FSM convention (`/root/reference/src/WFSTNetwork.cpp:480` "FSM weights
are -ve log"). The decoder artifact negates them at load time.
"""

from .semiring import LOG, TROPICAL, Semiring
from .fst import Fst, SymbolTable, EPSILON
from . import algos
from .io import read_fsm, write_fsm, read_symbols, write_symbols

__all__ = [
    "Fst",
    "SymbolTable",
    "EPSILON",
    "Semiring",
    "LOG",
    "TROPICAL",
    "algos",
    "read_fsm",
    "write_fsm",
    "read_symbols",
    "write_symbols",
]
