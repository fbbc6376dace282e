"""Multi-process (multi-host style) data-parallel decoding demo.

The reference scaled by manual cluster job splitting
(`juicer_userman.tex:584`); the TPU-native equivalent is
`jax.distributed`: each process owns a shard of the utterance corpus, the
network and GMM parameters are replicated, decode runs data-parallel, and
WER/frame statistics are aggregated with cross-process collectives.

This demo launches N local CPU processes (each with its own virtual
devices) coordinated through jax.distributed — the same code path a real
multi-host TPU pod uses (ICI within slice, DCN across hosts).

Usage:   python scripts/multihost_demo.py [n_processes]
Worker:  python scripts/multihost_demo.py --worker <i> <n> <port>
"""

import os
import subprocess
import sys


def worker(process_id: int, num_processes: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from test_decoder import make_models, scores_matrix
    from juicer_tpu.fst import Fst, LOG
    from juicer_tpu.decoder import DecoderNetwork, TpuDecoder
    from juicer_tpu.decoder.artifact import DecoderArtifact
    from juicer_tpu.decoder.tpu_core import TpuDecoderConfig

    # every process builds the same replicated task (deterministic seed)
    models = make_models(6, seed=3)
    f = Fst(LOG)
    s0 = f.add_state()
    f.set_start(s0)
    for w in range(6):
        f.add_arc(s0, s0, w + 1, w + 1, 0.4)
    f.set_final(s0, 0.0)
    net = DecoderNetwork(f)
    dec = TpuDecoder(
        DecoderArtifact(net, models),
        TpuDecoderConfig(max_insts=64, expand_budget=256, final_budget=64),
    )

    # corpus shard: utterances process_id, process_id+N, ...
    corpus_size, T = 8, 12
    my_utts = list(range(process_id, corpus_size, num_processes))
    n_words = 0
    n_frames = 0
    for u in my_utts:
        res = dec.decode_scores(scores_matrix(models, T, seed=u))
        n_words += len(res.words)
        n_frames += res.n_frames

    # aggregate statistics across processes (the WER/RTF reduction)
    totals = multihost_utils.process_allgather(
        jnp.asarray([n_words, n_frames, len(my_utts)])
    )
    agg = np.asarray(totals).sum(axis=0)
    if process_id == 0:
        print(
            f"MULTIHOST OK: {num_processes} processes, "
            f"{int(agg[2])} utterances, {int(agg[0])} words, "
            f"{int(agg[1])} frames total"
        )
    jax.distributed.shutdown()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    port = 12355
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(i), str(n), str(port)]
        )
        for i in range(n)
    ]
    rc = [p.wait() for p in procs]
    sys.exit(max(rc))


if __name__ == "__main__":
    main()
