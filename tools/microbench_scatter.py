#!/usr/bin/env python3
"""Scatter formulations for the cell placement (dest known, unique).

  A. two independent int32 scatters      (current scatter_cells)
  B. one scatter of stacked (N, 2) rows  (shared index processing)
  C. one int64 packed scatter
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    jax.config.update("jax_enable_x64", True)

    P = lambda *a: print(*a, flush=True)
    rng = np.random.RandomState(0)
    N = 3_200_000
    M = 3_900_000
    drop = np.iinfo(np.int32).max
    dest = rng.permutation(M)[:N].astype(np.int32)
    dest[rng.rand(N) < 0.01] = drop          # sentinels dropped
    ch1 = rng.randint(0, 1 << 13, N).astype(np.int32)
    ch2 = rng.randint(0, 1 << 22, N).astype(np.int32)
    d_dest, d1, d2 = map(jnp.asarray, (dest, ch1, ch2))

    probe = jax.jit(lambda x: jnp.sum(x.ravel()[:128].astype(jnp.int32)))

    def timed(name, fn, *args):
        r = fn(*args)
        for x in jax.tree_util.tree_leaves(r):
            int(probe(x)); break
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            r = fn(*args)
            for x in jax.tree_util.tree_leaves(r):
                int(probe(x)); break
            ts.append(time.perf_counter() - t0)
        P(f"{name}: {min(ts) * 1e3:.1f} ms")

    @jax.jit
    def scat_a(dest, a, b):
        o1 = jnp.zeros(M, jnp.int32).at[dest].set(a, mode="drop",
                                                  unique_indices=True)
        o2 = jnp.full(M, drop, jnp.int32).at[dest].set(b, mode="drop",
                                                       unique_indices=True)
        return o1, o2

    @jax.jit
    def scat_b(dest, a, b):
        v = jnp.stack([a, b], axis=1)                     # (N, 2)
        o = jnp.zeros((M, 2), jnp.int32).at[dest].set(
            v, mode="drop", unique_indices=True)
        return o[:, 0], o[:, 1]

    @jax.jit
    def scat_c(dest, a, b):
        v = (a.astype(jnp.int64) << 32) | b.astype(jnp.uint32).astype(
            jnp.int64)
        o = jnp.zeros(M, jnp.int64).at[dest].set(v, mode="drop",
                                                 unique_indices=True)
        return (o >> 32).astype(jnp.int32), o.astype(jnp.int32)

    timed("A two int32 scatters", scat_a, d_dest, d1, d2)
    timed("B stacked (N,2) scatter", scat_b, d_dest, d1, d2)
    timed("C int64 packed scatter", scat_c, d_dest, d1, d2)


if __name__ == "__main__":
    main()
