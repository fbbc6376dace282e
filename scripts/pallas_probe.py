"""Probe which Mosaic vector patterns compile on this TPU.

Each probe is a tiny standalone pallas_call exercising one pattern used by
decoder/pallas_scan.py. Prints PASS/FAIL + compile time per probe so kernel
design can route around unsupported relayouts without whole-kernel bisects.
"""

import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    t0 = time.perf_counter()
    try:
        out = jax.block_until_ready(fn())
        print(f"PASS {name}: {time.perf_counter() - t0:.1f}s "
              f"sum={float(jnp.sum(out)):.1f}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {time.perf_counter() - t0:.1f}s {msg}")


def make(kernel, out_shape, *args, scratch=()):
    f = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        scratch_shapes=list(scratch),
    )
    return lambda: f(*args)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    E, CW, W = 256, 128, 16
    tab = jnp.asarray(np.random.rand(CW, W), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, CW, (8, E)), jnp.float32)
    x3 = jnp.asarray(np.random.rand(8, E, CW), jnp.float32)

    # A: collapse (8, E, CW) -> (8E, CW), matmul, leave 2-D
    def kA(x_ref, t_ref, o_ref):
        x2 = x_ref[...].reshape(8 * E, CW)
        o_ref[...] = jnp.dot(x2, t_ref[...],
                             preferred_element_type=jnp.float32)

    # B: same + reshape result back to (8, E, W)
    def kB(x_ref, t_ref, o_ref):
        x2 = x_ref[...].reshape(8 * E, CW)
        r = jnp.dot(x2, t_ref[...], preferred_element_type=jnp.float32)
        o_ref[...] = r.reshape(8, E, W)

    # C: batched dot_general (8, E, CW) x (CW, W)
    def kC(x_ref, t_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], t_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # D: extract minor-dim column from (8, E, W)
    def kD(x_ref, o_ref):
        o_ref[...] = x_ref[...][:, :, 3]

    # E: one-hot build in 3-D then collapse+matmul (the _gather_rows body)
    def kE(i_ref, t_ref, o_ref):
        io = jax.lax.broadcasted_iota(jnp.int32, (8, E, CW), 2)
        oh = (i_ref[...][:, :, None] == io.astype(jnp.float32))
        r = jnp.dot(oh.astype(jnp.float32).reshape(8 * E, CW), t_ref[...],
                    preferred_element_type=jnp.float32)
        o_ref[...] = r

    # F: 2-D result column extract (8E, W)[:, c] -> keepdims (8E, 1)
    def kF(x_ref, o_ref):
        r = x_ref[...]
        o_ref[...] = r[:, 3:4]

    # G: reshape (8E, 1) -> ... no; instead (8E,) column to (8, E) via
    #    strided rows: r[:, c].reshape(8, E)
    def kG(x_ref, o_ref):
        o_ref[...] = x_ref[...][:, 3].reshape(8, E)

    # H: transpose-free alternative: keep (8E, W) and slice rows per group
    def kH(x_ref, o_ref):
        o_ref[...] = x_ref[...][0 * E:(0 + 1) * E, :]

    # I: wide-table one-hot gather: table (1024, W), idx over it, chunked
    def kI(i_ref, t_ref, o_ref):
        acc = None
        for c0 in range(0, 1024, 512):
            io = jax.lax.broadcasted_iota(jnp.int32, (8, E, 512), 2)
            oh = (i_ref[...][:, :, None] == (io.astype(jnp.float32) + c0))
            r = jnp.dot(oh.astype(jnp.float32).reshape(8 * E, 512),
                        t_ref[c0:c0 + 512, :],
                        preferred_element_type=jnp.float32)
            acc = r if acc is None else acc + r
        o_ref[...] = acc

    f32 = jnp.float32
    probes = {
        "A_collapse_matmul_2d": make(
            kA, jax.ShapeDtypeStruct((8 * E, W), f32), x3, tab),
        "B_plus_reshape_back_3d": make(
            kB, jax.ShapeDtypeStruct((8, E, W), f32), x3, tab),
        "C_batched_dot_general": make(
            kC, jax.ShapeDtypeStruct((8, E, W), f32), x3, tab),
        "D_minor_col_extract_3d": make(
            kD, jax.ShapeDtypeStruct((8, E), f32),
            jnp.asarray(np.random.rand(8, E, W), f32)),
        "E_onehot_gather_2d": make(
            kE, jax.ShapeDtypeStruct((8 * E, W), f32), idx, tab),
        "F_col_extract_2d": make(
            kF, jax.ShapeDtypeStruct((8 * E, 1), f32),
            jnp.asarray(np.random.rand(8 * E, W), f32)),
        "G_col_to_8E_reshape": make(
            kG, jax.ShapeDtypeStruct((8, E), f32),
            jnp.asarray(np.random.rand(8 * E, W), f32)),
        "H_row_slice_2d": make(
            kH, jax.ShapeDtypeStruct((E, W), f32),
            jnp.asarray(np.random.rand(8 * E, W), f32)),
        "I_chunked_gather_1024": make(
            kI, jax.ShapeDtypeStruct((8 * E, W), f32),
            jnp.asarray(np.random.randint(0, 1024, (8, E)), f32),
            jnp.asarray(np.random.rand(1024, W), f32)),
    }
    for name, fn in probes.items():
        if which != "all" and not name.startswith(which):
            continue
        probe(name, fn)


if __name__ == "__main__":
    main()
