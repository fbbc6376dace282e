"""Batch decoding harness: feature IO, WER scoring, output formats."""

from .features import read_htk, write_htk, read_lna, write_lna
from .editdist import EditDistance, align
from .batch import BatchTester, OutputFormat, UtteranceSpec

__all__ = [
    "read_htk",
    "write_htk",
    "read_lna",
    "write_lna",
    "EditDistance",
    "align",
    "BatchTester",
    "OutputFormat",
    "UtteranceSpec",
]
