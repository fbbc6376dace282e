"""Compiled (non-interpret) Pallas kernel smoke test on REAL TPU hardware.

CI runs every Pallas parity test in interpret mode on CPU
(test_decode_pallas.py); a Mosaic lowering regression would ship
silently. This test compiles the fused decode scan on the actual TPU
and asserts record-for-record equality with the XLA scan.

Gated: the unit-test conftest pins JAX to CPU, so this only runs with
`JTPU_TEST_TPU=1 python -m pytest tests/test_pallas_tpu.py` on a machine
with a TPU attached (the quick-shape kernel compiles in ~40 s there).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("JTPU_TEST_TPU"),
    reason="real-TPU test; set JTPU_TEST_TPU=1 to run",
)


def test_compiled_pallas_scan_matches_xla_on_tpu():
    import jax
    import jax.numpy as jnp

    if jax.devices()[0].platform == "cpu":
        pytest.skip("no TPU device")

    from test_decode_pallas import _mk, _batch_scores, B
    from juicer_tpu.decoder.pallas_scan import PallasDecodeScan

    task, dec, scorer = _mk(beams=True)
    scores_tbg, _, _ = _batch_scores(task, scorer, seed=3)

    ps = PallasDecodeScan(dec, B=B, chunk=64, interpret=False)  # compiled
    carry_p, ys_p = ps(jnp.asarray(scores_tbg))

    def one(s):
        carry, ys, rec0 = dec._decode_scan(s.astype(dec._dt))
        return carry, ys

    carry_x, ys_x = jax.vmap(one, in_axes=1)(jnp.asarray(scores_tbg))

    for k in ["rec_prev", "rec_seq", "rec_score", "rec_ac", "rec_lm"]:
        np.testing.assert_array_equal(
            np.asarray(ys_p[k]), np.asarray(ys_x[k]).transpose(1, 0, 2),
            err_msg=k,
        )
    for k in ["bf_score", "bf_path", "bf_seq"]:
        np.testing.assert_array_equal(
            np.asarray(ys_p[k]), np.asarray(ys_x[k]).transpose(1, 0),
            err_msg=k,
        )
