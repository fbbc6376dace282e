"""Decoder cores: runtime network, numpy oracle, and the TPU engine."""

from .autotune import autotune_budgets
from .network import DecoderNetwork
from .ref_core import RefDecoder, DecodeResult
from .tpu_core import TpuDecoder

__all__ = [
    "DecoderNetwork",
    "RefDecoder",
    "DecodeResult",
    "TpuDecoder",
    "autotune_budgets",
]
