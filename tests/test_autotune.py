"""Budget autotuning tests (decoder/autotune.py) and occupancy stats."""

import numpy as np

from juicer_tpu.decoder import autotune_budgets
from juicer_tpu.decoder.tpu_core import TpuDecoder, TpuDecoderConfig
from juicer_tpu.ops.gmm import make_gmm_scorer
from juicer_tpu.utils.synth import make_synth_task


def setup_task(seed=0, n_utts=3):
    task = make_synth_task(n_words=20, n_phones=10, vec_size=8, n_comps=2, seed=seed)
    scorer = make_gmm_scorer(task.models.flat_params())
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(20)]
    samples = []
    for _ in range(n_utts):
        seq = [words[rng.integers(20)] for _ in range(4)]
        f = task.synth_utterance(seq, rng)
        samples.append(np.asarray(scorer(f.astype(np.float32))))
    return task, samples


class TestOccupancyStats:
    def test_result_carries_peaks(self):
        task, samples = setup_task()
        dec = TpuDecoder(
            task.artifact,
            TpuDecoderConfig(max_insts=512, expand_budget=2048, final_budget=128,
                             emit_diagnostics=True),
        )
        r = dec.decode_scores(samples[0])
        assert r.max_active > 0
        assert r.max_cand > 0
        assert r.max_active >= r.avg_active
        assert r.max_active <= 512
        assert not r.overflow

    def test_overflow_flag_surfaces(self):
        import warnings

        task, samples = setup_task()
        dec = TpuDecoder(
            task.artifact,
            TpuDecoderConfig(max_insts=16, expand_budget=32, final_budget=8,
                             emit_diagnostics=True),
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r = dec.decode_scores(samples[0])
        assert r.overflow


class TestAutotune:
    def test_tuned_config_exact_and_smaller(self):
        task, samples = setup_task()
        start = TpuDecoderConfig(max_insts=1024, expand_budget=8192, final_budget=256)
        tuned = autotune_budgets(task.artifact, samples, cfg=start, margin=1.5)
        assert tuned.max_insts <= start.max_insts
        assert tuned.expand_budget <= start.expand_budget
        # exactness: tuned decode == generous decode, word for word
        big = TpuDecoder(task.artifact, start)
        small = TpuDecoder(task.artifact, tuned)
        for s in samples:
            a, b = big.decode_scores(s), small.decode_scores(s)
            assert a.words == b.words
            assert abs(a.score - b.score) < 1e-6

    def test_grows_out_of_overflow(self):
        import warnings

        task, samples = setup_task(seed=1)
        start = TpuDecoderConfig(max_insts=16, expand_budget=64, final_budget=16)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            tuned = autotune_budgets(task.artifact, samples, cfg=start, margin=1.3)
        dec = TpuDecoder(
            task.artifact,
            TpuDecoderConfig(max_insts=tuned.max_insts,
                             expand_budget=tuned.expand_budget,
                             final_budget=tuned.final_budget,
                             emit_diagnostics=True),
        )
        for s in samples:
            assert not dec.decode_scores(s).overflow
