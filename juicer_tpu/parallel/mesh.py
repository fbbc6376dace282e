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

    def __init__(self, decoder: TpuDecoder, mesh: Optional[Mesh] = None,
                 axis: str = "data", use_pallas="auto", pallas_chunk: int = 128,
                 pallas_interpret: bool = False):
        self.decoder = decoder
        self.mesh = mesh
        self.axis = axis
        self.use_pallas = use_pallas
        self.pallas_chunk = pallas_chunk
        self.pallas_interpret = pallas_interpret
        self._ps = {}  # B_local -> (PallasDecodeScan, batch fn)

        # device tables as jit args (see TpuDecoder._decode_jit): big
        # closed-over tables otherwise ride every lowering as constants
        def batched(dev, scores):
            saved = decoder.dev
            decoder.dev = dev
            try:
                return jax.vmap(decoder._decode_scan)(scores)
            finally:
                decoder.dev = saved

        if mesh is not None:
            sharding = NamedSharding(mesh, P(axis))
            fn = jax.jit(batched, in_shardings=(None, sharding),
                         out_shardings=sharding)
        else:
            fn = jax.jit(batched)
        self._fn = lambda scores: fn(decoder.dev, scores)

    # -- fused Pallas path ------------------------------------------------

    def _n_shards(self) -> int:
        return int(self.mesh.devices.size) if self.mesh is not None else 1

    def _pallas_ok(self, B: int, T: int, lengths=None) -> bool:
        """Route through the fused VMEM-resident kernel when the decoder
        config is inside its fast path, the batch splits into 8-row sublane
        groups per shard, and the (chunk-padded) frame count stays within
        the kernel's f32-exact record-id range."""
        if self.use_pallas is False:
            return False
        from ..decoder.pallas_scan import max_scan_T, pallas_eligible

        C = self.pallas_chunk
        T_pad = -(-max(T, 1) // C) * C
        ok = (
            pallas_eligible(self.decoder)
            and B % (8 * self._n_shards()) == 0
            and T > 0
            and (lengths is None or min(int(x) for x in lengths) > 0)
            and T_pad <= max_scan_T(self.decoder)
        )
        if not ok and self.use_pallas is True:
            raise ValueError(
                "use_pallas=True but decoder/batch outside the Pallas fast "
                "path (see pallas_scan.pallas_eligible; batch must be a "
                "multiple of 8 per shard, frames in (0, max_scan_T])"
            )
        return ok

    def _get_pallas(self, B_local: int):
        if B_local not in self._ps:
            from ..decoder.pallas_scan import PallasDecodeScan

            ps = PallasDecodeScan(self.decoder, B=B_local,
                                  chunk=self.pallas_chunk,
                                  interpret=self.pallas_interpret)
            if self._n_shards() == 1:
                fn = jax.jit(ps.run_fn())
            else:
                # each shard runs its own B_local-sized kernel; the batch
                # axis is sharded outside the kernel, so scaling is pure DP
                run = ps.run_fn()

                def g(c, s):
                    return run(c, s, jnp.int32(0))

                ax = self.axis
                # carry leaves: (B, K)/(B, 1) or (S, B, K); ys leaves:
                # (T, B) or (T, B, K) — batch rides axis 0 of 2-D carry
                # leaves and axis 1 everywhere else
                carry_spec = jax.tree.map(
                    lambda x: P(ax, None) if x.ndim == 2
                    else P(None, ax, None),
                    dict(ps.init),
                )
                abs_scores = jax.ShapeDtypeStruct(
                    (self.pallas_chunk, B_local, ps.sh.G), jnp.float32
                )
                abs_carry, abs_ys = jax.eval_shape(g, dict(ps.init), abs_scores)
                ys_spec = jax.tree.map(
                    lambda x: P(None, ax) if x.ndim == 2
                    else P(None, ax, None),
                    abs_ys,
                )
                fn = jax.jit(
                    jax.shard_map(
                        g,
                        mesh=self.mesh,
                        in_specs=(carry_spec, P(None, ax, None)),
                        out_specs=(carry_spec, ys_spec),
                        check_vma=False,
                    )
                )
            self._ps[B_local] = (ps, fn)
        return self._ps[B_local]

    def _decode_batch_pallas(self, gmm_scores: np.ndarray, lengths) -> list:
        from ..decoder.pallas_scan import assemble_results

        B, T = gmm_scores.shape[:2]
        n_sh = self._n_shards()
        C = self.pallas_chunk
        T_pad = -(-max(T, 1) // C) * C
        if T_pad != T:
            gmm_scores = np.concatenate(
                [gmm_scores, np.repeat(gmm_scores[:, -1:], T_pad - T, axis=1)],
                axis=1,
            )
        ps, fn = self._get_pallas(B // n_sh)
        scores = jnp.asarray(
            np.ascontiguousarray(np.transpose(gmm_scores, (1, 0, 2))),
            jnp.float32,
        )
        if n_sh == 1:
            carry, ys = fn(dict(ps.init), scores, jnp.int32(0))
        else:
            init = jax.tree.map(
                lambda x: jnp.tile(x, (n_sh, 1)) if x.ndim == 2
                else jnp.tile(x, (1, n_sh, 1)),
                dict(ps.init),
            )
            carry, ys = fn(init, scores)
        if lengths is None:
            lengths = [T] * B
        return assemble_results(self.decoder, ps, carry, ys, lengths)

    def decode_scores_batch(self, gmm_scores: np.ndarray, lengths=None) -> list:
        """gmm_scores: (B, T, n_gmms), optionally padded to a common T with
        per-utterance true `lengths` (the per-frame best-final snapshot in
        the scan output makes padded decodes exact). Returns DecodeResults.
        """
        gmm_scores = np.asarray(gmm_scores)
        B, T = gmm_scores.shape[:2]
        if self._pallas_ok(B, T, lengths):
            return self._decode_batch_pallas(gmm_scores, lengths)
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
