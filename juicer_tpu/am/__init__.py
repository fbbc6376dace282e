"""Acoustic models: HTK MMF parsing, model store, flat GMM packing, scoring."""

from .mmf import MMFParseError, parse_mmf, write_mmf
from .models import AcousticModelSet, FlatGmmParams

__all__ = [
    "parse_mmf",
    "write_mmf",
    "MMFParseError",
    "AcousticModelSet",
    "FlatGmmParams",
]
