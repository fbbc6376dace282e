"""Language models: ARPA n-gram reader and BBN word-pair grammar."""

from .arpa import ArpaLM
from .wordpair import WordPairLM

__all__ = ["ArpaLM", "WordPairLM"]
