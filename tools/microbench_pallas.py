#!/usr/bin/env python3
"""Microbenchmarks for the Pallas primitives the round-3 data-movement
kernels lean on: lane rolls (bitonic lane stages), sublane-block
compare-exchange (row stages), and 2-D transposes (dense-lane input
loading).  Run on the real chip; prints per-primitive timings."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, args, n=5, rtt=0.0):
    probe = jax.jit(lambda x: jnp.sum(x.ravel()[:128]))
    r = fn(*args)
    float(probe(jax.tree_util.tree_leaves(r)[0]))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        float(probe(jax.tree_util.tree_leaves(r)[0]))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - rtt, 0.0)


def roll_kernel(x_ref, o_ref, *, reps):
    x = x_ref[:]
    for i in range(reps):
        x = pltpu.roll(x, 1 << (i % 7), axis=1) + 1
    o_ref[:] = x


def rowcx_kernel(x_ref, o_ref, *, reps):
    x = x_ref[:]
    R = x.shape[0]
    for i in range(reps):
        b = 1 << (i % 8)
        v = x.reshape(R // (2 * b), 2, b, 128)
        lo, hi = v[:, 0], v[:, 1]
        nlo = jnp.minimum(lo, hi)
        nhi = jnp.maximum(lo, hi)
        x = jnp.stack([nlo, nhi], axis=1).reshape(R, 128)
    o_ref[:] = x


def transpose_kernel(x_ref, o_ref, *, reps):
    x = x_ref[:]
    for _ in range(reps):
        x = x.T + 1
        x = x.T + 1
    o_ref[:] = x


def bench(kernel, shape, reps, name, rtt):
    f = pl.pallas_call(
        functools.partial(kernel, reps=reps),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    x = jnp.arange(np.prod(shape), dtype=jnp.int32).reshape(shape)
    jf = jax.jit(f)
    try:
        t = timed(jf, (x,), rtt=rtt)
        per = t / reps
        el = np.prod(shape)
        print(f"{name:30s} {t*1e3:8.3f} ms total, {per*1e6:8.2f} us/pass,"
              f" {el/per/1e9:8.2f} Gelem/s/pass", flush=True)
    except Exception as e:
        print(f"{name:30s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def main():
    tiny = jax.jit(lambda x: x[:1] + 1)
    z = jnp.zeros((8, 128), jnp.int32)
    float(jnp.sum(tiny(z)))
    t0 = time.perf_counter()
    for _ in range(3):
        float(jnp.sum(tiny(z)))
    rtt = (time.perf_counter() - t0) / 3
    print(f"backend={jax.default_backend()} rtt={rtt*1e3:.2f} ms",
          flush=True)

    bench(roll_kernel, (512, 128), 64, "roll lanes (512,128) x64", rtt)
    bench(roll_kernel, (2048, 128), 64, "roll lanes (2048,128) x64", rtt)
    bench(rowcx_kernel, (512, 128), 64, "row cmpex (512,128) x64", rtt)
    bench(rowcx_kernel, (2048, 128), 64, "row cmpex (2048,128) x64", rtt)
    bench(transpose_kernel, (128, 128), 32, "transpose (128,128) x64", rtt)
    bench(transpose_kernel, (512, 128), 32, "transpose (512,128) x64", rtt)


if __name__ == "__main__":
    main()
