"""Offline WFST compilation: G/L/C/H generation and the CLG build pipeline."""

from .gram import GramGen, GramType
from .lex import LexGen
from .cd import CDGen, CDPhoneLookup, CDType
from .hmm2fst import HmmGen
from .pipeline import build_clg, aux_to_eps

__all__ = [
    "GramGen",
    "GramType",
    "LexGen",
    "CDGen",
    "CDPhoneLookup",
    "CDType",
    "HmmGen",
    "build_clg",
    "aux_to_eps",
]
