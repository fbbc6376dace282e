"""TPU compute kernels (JAX/XLA + Pallas)."""

from .gmm import gmm_scores_dense, make_gmm_scorer

__all__ = ["gmm_scores_dense", "make_gmm_scorer"]
