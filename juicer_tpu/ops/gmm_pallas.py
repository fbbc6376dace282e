"""Pallas TPU kernel: fused log-Gaussian-mixture scoring.

The dense scorer (ops/gmm.py) is two XLA matmuls + a masked logsumexp; this
kernel fuses the quadratic-form matmul and the per-GMM logsumexp in VMEM so
component logits never round-trip through HBM — the TPU-native form of the
`HTKFlatModels` flat-array + IPP SIMD design
(`/root/reference/src/HTKFlatModels.cpp:94-185,226-266`).

Layout: parameters are packed component-major — W (2D, C*G) with column
c*G+g — so the logsumexp over components reduces across C contiguous
(lane-aligned) column groups with static slicing. Padded components carry
b = -1e30 and vanish in the exponential, so no separate mask input is
needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..am.models import FlatGmmParams

NEG = -1e30


def _kernel(x2_ref, w_ref, b_ref, o_ref, *, C: int, Gb: int):
    logits = (
        jnp.dot(x2_ref[:], w_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + b_ref[:]
    )  # (Tb, C*Gb)
    m = logits[:, :Gb]
    for c in range(1, C):
        m = jnp.maximum(m, logits[:, c * Gb : (c + 1) * Gb])
    safe_m = jnp.where(m <= NEG / 2, 0.0, m)
    s = jnp.zeros_like(m)
    for c in range(C):
        s = s + jnp.exp(logits[:, c * Gb : (c + 1) * Gb] - safe_m)
    o_ref[:] = jnp.where(m <= NEG / 2, NEG, safe_m + jnp.log(s))


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=16)
def _build(T_pad: int, D2: int, G_pad: int, C: int, Tb: int, Gb: int, interpret: bool):
    from jax.experimental import pallas as pl

    grid = (T_pad // Tb, G_pad // Gb)
    return pl.pallas_call(
        functools.partial(_kernel, C=C, Gb=Gb),
        out_shape=jax.ShapeDtypeStruct((T_pad, G_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Tb, D2), lambda i, j: (i, 0)),
            pl.BlockSpec((D2, C * Gb), lambda i, j: (0, j)),
            pl.BlockSpec((1, C * Gb), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((Tb, Gb), lambda i, j: (i, j)),
        interpret=interpret,
    )


def make_pallas_gmm_scorer(params: FlatGmmParams, interpret: bool = False):
    """(T, D) features -> (T, G) GMM log-likelihoods, via the Pallas kernel.

    interpret=True runs the kernel in interpreter mode (CPU testing).
    """
    G, C, D = params.n_gmms, params.max_comps, params.vec_size
    Gb = min(_round_up(G, 128), 512)
    G_pad = _round_up(G, Gb)
    Tb = 128
    D2 = 2 * D

    # component-major packing: column c*G+g
    def to_cg(a):  # (D, G*C) g-major -> (D, C*G_pad) c-major
        a = a.reshape(D, G, C).transpose(0, 2, 1)  # (D, C, G)
        out = np.zeros((D, C, G_pad), a.dtype)
        out[:, :, :G] = a
        return out.reshape(D, C * G_pad)

    W = np.concatenate([to_cg(params.V), to_cg(params.M)], axis=0)  # (2D, C*G_pad)
    b = params.b.reshape(G, C).T  # (C, G)
    b_pad = np.full((C, G_pad), NEG, np.float32)
    b_pad[:, :G] = b
    b_pad = b_pad.reshape(1, C * G_pad)

    W_dev = jnp.asarray(W, jnp.float32)
    b_dev = jnp.asarray(b_pad, jnp.float32)

    # Fixed chunk length: pallas_call compile time grows with the grid, so
    # long utterance batches are mapped over fixed-size chunks (the kernel
    # compiles once for the chunk shape).
    CHUNK = 4096

    @jax.jit
    def scorer(features):
        T = features.shape[0]
        x = features.astype(jnp.float32)
        x2 = jnp.concatenate([x * x, x], axis=1)  # (T, 2D)
        if T <= CHUNK:
            T_pad = _round_up(max(T, 1), Tb)
            fn = _build(T_pad, D2, G_pad, C, Tb, Gb, interpret)
            out = fn(jnp.pad(x2, ((0, T_pad - T), (0, 0))), W_dev, b_dev)
            return out[:T, :G]
        n_chunks = -(-T // CHUNK)
        x2 = jnp.pad(x2, ((0, n_chunks * CHUNK - T), (0, 0)))
        fn = _build(CHUNK, D2, G_pad, C, Tb, Gb, interpret)
        out = jax.lax.map(
            lambda c: fn(c, W_dev, b_dev), x2.reshape(n_chunks, CHUNK, D2)
        )
        return out.reshape(n_chunks * CHUNK, G_pad)[:T, :G]

    return scorer
