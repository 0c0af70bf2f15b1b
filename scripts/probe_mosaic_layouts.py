"""Probe which in-kernel layout moves Mosaic compiles on this toolchain.

The V=512 chunked hyena kernel needs (bb, chunk, C) -> (C, bb, chunk)
channel-major staging. The original lane-split reshape
(C, bb*chunk) -> (C, bb, chunk) fails Mosaic layout inference
("unsupported shape cast"); this probes the alternatives on the real chip:

  a. lane-split reshape with chunk=128 (native lane width)
  b. plain 2D vector transpose (chunk, C) -> (C, chunk)
  c. identity-matmul transpose per (q, b) row
  d. lane-slice store: (C, bb*chunk) transposed once, stored via lane slices

Usage: python scripts/probe_mosaic_layouts.py [a b c d]
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BB, CHUNK, C = 8, 64, 96


def run(name, kernel, out_shape, *args):
    try:
        got = pl.pallas_call(kernel, out_shape=out_shape)(*args)
        got.block_until_ready()
        return name, "OK", got
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        return name, f"FAIL {type(e).__name__}: {msg}", None


def main():
    which = sys.argv[1:] or ["a", "b", "c", "d"]
    x = jnp.asarray(np.random.RandomState(0).rand(BB, CHUNK, C).astype(np.float32))
    want = np.transpose(np.asarray(x), (2, 0, 1))  # (C, BB, CHUNK)

    results = []

    if "a" in which:
        x128 = jnp.asarray(np.random.RandomState(1).rand(C, BB * 128).astype(np.float32))

        def k_a(x_ref, o_ref):
            o_ref[...] = x_ref[...].reshape(C, BB, 128)

        name, status, got = run("a_reshape_lane128", k_a,
                                jax.ShapeDtypeStruct((C, BB, 128), jnp.float32), x128)
        if got is not None:
            ok = np.allclose(np.asarray(got), np.asarray(x128).reshape(C, BB, 128))
            status += f" parity={ok}"
        results.append((name, status))

    if "b" in which:
        def k_b(x_ref, o_ref):
            for b in range(BB):
                o_ref[:, b, :] = x_ref[b].T

        name, status, got = run("b_2d_transpose", k_b,
                                jax.ShapeDtypeStruct((C, BB, CHUNK), jnp.float32), x)
        if got is not None:
            status += f" parity={np.allclose(np.asarray(got), want)}"
        results.append((name, status))

    if "c" in which:
        ident = jnp.eye(C, dtype=jnp.float32)

        def k_c(x_ref, i_ref, o_ref):
            for b in range(BB):
                o_ref[:, b, :] = jax.lax.dot_general(
                    i_ref[...], x_ref[b], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

        name, status, got = run("c_identity_matmul", k_c,
                                jax.ShapeDtypeStruct((C, BB, CHUNK), jnp.float32),
                                x, ident)
        if got is not None:
            status += f" parity={np.allclose(np.asarray(got), want)}"
        results.append((name, status))

    if "d" in which:
        def k_d(x_ref, o_ref):
            flat = x_ref[...].reshape(BB * CHUNK, C)   # sublane merge: ok?
            t = flat.T                                  # (C, BB*CHUNK)
            for b in range(BB):
                o_ref[:, b, :] = t[:, b * CHUNK:(b + 1) * CHUNK]

        name, status, got = run("d_lane_slice_store", k_d,
                                jax.ShapeDtypeStruct((C, BB, CHUNK), jnp.float32), x)
        if got is not None:
            status += f" parity={np.allclose(np.asarray(got), want)}"
        results.append((name, status))

    for name, status in results:
        print(f"{name}: {status}")


if __name__ == "__main__":
    main()
