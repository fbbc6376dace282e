"""Device-mesh batch decoding.

The reference scaled by manual cluster job-splitting
(`juicer_userman.tex:584` — "run in a parallelised manner on a 16-CPU linux
cluster"); the TPU-native equivalent (SURVEY.md §2.7) is in-process data
parallelism over utterances: a 1-D `jax.sharding.Mesh` whose `data` axis
shards the utterance batch, with the search network, expansion tables and
GMM parameters replicated on every chip, and WER/RTF statistics aggregated
with collectives. Per-utterance decode state never crosses chips, so the
only communication is the final metric reduction — this is the
embarrassingly-parallel regime the decoder lives in, laid out so the batch
axis rides ICI/DCN only at the edges.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..decoder.tpu_core import TpuDecoder


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


class BatchDecoder:
    """Batch of utterances decoded data-parallel over a mesh.

    Wraps a `TpuDecoder`: vmaps the per-utterance `lax.scan` over a batch
    axis and shards that axis over the mesh. Utterances are padded to a
    common frame count; per-utterance true lengths mask the tail by feeding
    LOG_ZERO-free no-op frames (scores of 0 for every GMM keep relative
    token order stable but would perturb scores, so instead we pad with
    repeated last frames and cut the traceback at the true length — exact
    results require equal-length buckets, which the harness provides).
    """

    def __init__(self, decoder: TpuDecoder, mesh: Optional[Mesh] = None, axis: str = "data"):
        self.decoder = decoder
        self.mesh = mesh
        self.axis = axis
        batched = jax.vmap(decoder._decode_scan)
        if mesh is not None:
            sharding = NamedSharding(mesh, P(axis))
            self._fn = jax.jit(batched, in_shardings=(sharding,), out_shardings=sharding)
        else:
            self._fn = jax.jit(batched)

    def decode_scores_batch(self, gmm_scores: np.ndarray, lengths=None) -> list:
        """gmm_scores: (B, T, n_gmms), optionally padded to a common T with
        per-utterance true `lengths` (the per-frame best-final snapshot in
        the scan output makes padded decodes exact). Returns DecodeResults.
        """
        B = gmm_scores.shape[0]
        carry, ys, rec0 = self._fn(jnp.asarray(gmm_scores, self.decoder._dt))
        out = []
        for b in range(B):
            c_b = jax.tree.map(lambda x: x[b], carry)
            ys_b = jax.tree.map(lambda x: x[b], ys)
            r0_b = jax.tree.map(lambda x: x[b], rec0)
            true_T = int(lengths[b]) if lengths is not None else None
            out.append(
                self.decoder._traceback(
                    c_b, ys_b, r0_b, gmm_scores.shape[1], true_T=true_T
                )
            )
        return out
