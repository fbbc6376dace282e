"""Batched log-Gaussian-mixture acoustic scoring.

TPU-native replacement for `HTKFlatModels::calcGMMOutput`
(`/root/reference/src/HTKFlatModels.cpp:226-266`): instead of scoring only
the GMMs demanded by active tokens (with a per-GMM block cache and IPP SIMD
kernel), we score EVERY GMM for EVERY frame of a chunk as two MXU matmuls —
the quadratic form is expanded offline (see
`AcousticModelSet.flat_params`) so

    comp_logits = [x*x, x] @ [V; M] + b          (T, G*C)
    scores      = logsumexp_c(comp_logits)       (T, G)

This removes all data-dependent control flow from the scoring path and is
the intended "frame-block batching" design on TPU (SURVEY.md §2.7, §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..am.models import FlatGmmParams

NEG_INF = -1e30


def gmm_scores_dense(
    features: jax.Array,  # (T, D)
    V: jax.Array,  # (D, G*C)
    M: jax.Array,  # (D, G*C)
    b: jax.Array,  # (G*C,)
    comp_mask: jax.Array,  # (G, C) bool
) -> jax.Array:
    """Scores for all GMMs for all frames: (T, G) float32."""
    T = features.shape[0]
    G, C = comp_mask.shape
    x = features.astype(jnp.float32)
    # HIGHEST precision: on TPU this forces true-f32 matmuls (multi-pass
    # bf16) — the expanded quadratic form cancels significantly when x≈μ,
    # so bf16 products would perturb scores by ~1e-3 and flip Viterbi ties.
    logits = (
        jnp.dot(x * x, V, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(x, M, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        + b[None, :]
    )
    logits = logits.reshape(T, G, C)
    logits = jnp.where(comp_mask[None, :, :], logits, NEG_INF)
    m = jnp.max(logits, axis=-1)
    # guard fully-masked rows
    safe_m = jnp.where(m <= NEG_INF, 0.0, m)
    out = safe_m + jnp.log(
        jnp.sum(jnp.exp(logits - safe_m[:, :, None]) * comp_mask[None, :, :], axis=-1)
    )
    return jnp.where(m <= NEG_INF, NEG_INF, out)


def make_gmm_scorer(params: FlatGmmParams, use_pallas: str = "auto"):
    """Returns a jitted (features (T,D)) -> (T, G) scorer with params closed
    over as device constants.

    use_pallas: "auto" uses the fused Pallas kernel on TPU backends (~20%
    faster than the XLA-fused dense form), "never" forces the dense scorer,
    "always" forces the kernel (interpreted off-TPU).
    """
    if use_pallas != "never":
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        if use_pallas == "always" or on_tpu:
            from .gmm_pallas import make_pallas_gmm_scorer

            return make_pallas_gmm_scorer(params, interpret=not on_tpu)

    V = jnp.asarray(params.V)
    M = jnp.asarray(params.M)
    b = jnp.asarray(params.b)
    mask = jnp.asarray(params.mask)

    @jax.jit
    def scorer(features):
        return gmm_scores_dense(features, V, M, b, mask)

    return scorer


def hybrid_scores(features: jax.Array, log_priors: jax.Array) -> jax.Array:
    """Hybrid HMM/ANN path: observation = log posterior − log prior
    (`HTKFlatModels.cpp:196-220`)."""
    return features - log_priors[None, :]
