#!/usr/bin/env python3
"""Capability probes for the expand kernel design (run on the chip).

1. scalar extraction: jnp.max(vec) -> scalar used in pl.ds
2. large scalar-prefetch array (98K int32)
3. traced-scalar indexing into prefetch array inside fori_loop
4. dynamic-shift pltpu.roll + dynamic pl.ds on VMEM scratch sublanes
5. take_along_axis multi-row gather with broadcast per-lane indices
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        r = fn()
        print(f"OK   {name}: {r}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)


def p1_scalar_extract():
    def kern(x_ref, o_ref):
        v = x_ref[...]
        m = jnp.max(v)                      # scalar from vector
        o_ref[...] = v + m

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(x)
    return int(y[0, 0])                     # expect 1023


def p1b_scalar_in_ds():
    def kern(x_ref, o_ref, scr):
        v = x_ref[...]
        m = jnp.max(v[0, :]) % 4            # data-dependent row index
        scr[...] = v
        o_ref[0:1] = scr[pl.ds(m, 1)]

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) % 7
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)])(x)
    return int(y[0, 0])


def p2_big_prefetch(n):
    tab = jnp.arange(n, dtype=jnp.int32)

    def kern(tab_ref, x_ref, o_ref):
        i = pl.program_id(0)

        def body(r, acc):
            return acc + tab_ref[i * 16 + r]

        acc = jax.lax.fori_loop(0, 16, body, 0)
        o_ref[...] = x_ref[...] * 0 + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(4,),
        in_specs=[pl.BlockSpec((1, 128), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM))
    x = jnp.zeros((4, 128), jnp.int32)
    y = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, 128), jnp.int32))(tab, x)
    return int(y[0, 0])                     # expect sum 0..15 = 120


def p4_roll_dynamic():
    def kern(x_ref, o_ref):
        v = x_ref[...]
        r = jnp.max(v[0, :]) % 128          # dynamic shift
        sh = (128 - r) % 128
        o_ref[...] = pltpu.roll(v, sh, axis=1)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) % 128
    y = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(x)
    return int(y[0, 0])


def p5_taa_rows():
    def kern(x_ref, i_ref, o_ref):
        v = x_ref[...]                      # (10, 128)
        idx = i_ref[...]                    # (1, 128) in [0,128)
        idxb = jnp.broadcast_to(idx, (10, 128))
        o_ref[...] = jnp.take_along_axis(v, idxb, axis=1)

    x = jnp.arange(10 * 128, dtype=jnp.int32).reshape(10, 128)
    idx = (jnp.arange(128, dtype=jnp.int32)[None, :] * 7) % 128
    y = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((10, 128), jnp.int32))(x, idx)
    ref = np.take_along_axis(np.asarray(x),
                             np.broadcast_to(np.asarray(idx), (10, 128)),
                             axis=1)
    return bool(np.array_equal(np.asarray(y), ref))


def main():
    print("backend:", jax.default_backend(), flush=True)
    probe("scalar extract (jnp.max)", p1_scalar_extract)
    probe("scalar in pl.ds", p1b_scalar_in_ds)
    probe("prefetch 12K", lambda: p2_big_prefetch(12 * 1024))
    probe("prefetch 32K", lambda: p2_big_prefetch(32 * 1024))
    probe("prefetch 128K", lambda: p2_big_prefetch(128 * 1024))
    probe("dynamic roll", p4_roll_dynamic)
    probe("take_along_axis rows", p5_taa_rows)


if __name__ == "__main__":
    main()
