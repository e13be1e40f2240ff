#!/usr/bin/env python3
"""Sort-shape microbench for the round-5 movement redesign.

Times jax.lax.sort for the exact domains the device FFV1 pipeline uses:
  - flat global sorts (the round-4 destsort/unsort shape)
  - per-slice batched sorts (the candidate round-5 shape)
  - operand-count scaling (key + N payload words)
plus the pallas bitonic row sorter for the same shapes, and a raw
HBM copy pass as the roofline anchor.
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
    P = lambda *a: print(*a, flush=True)
    probe = jax.jit(lambda x: jnp.sum(x.ravel()[:128]))

    def sync(r):
        for x in jax.tree_util.tree_leaves(r):
            if hasattr(x, "ravel"):
                float(probe(x))
                return

    tiny = jax.jit(lambda x: x[:1] + 1)
    z = jnp.zeros((8, 128), jnp.int32)
    sync(tiny(z))
    t0 = time.perf_counter()
    for _ in range(3):
        sync(tiny(z))
    rtt = (time.perf_counter() - t0) / 3
    P(f"rtt {rtt*1e3:.1f} ms")

    def timed(name, fn, *args):
        r = fn(*args)
        sync(r)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            r = fn(*args)
            sync(r)
            ts.append(time.perf_counter() - t0)
        P(f"{name}: {max(min(ts)-rtt,0)*1e3:.2f} ms")

    rng = np.random.RandomState(1)

    # roofline anchor: one full HBM pass (copy) of 16 MB / 48 MB
    for mb in (16, 48):
        n = mb * 1024 * 1024 // 4
        x = jnp.asarray(rng.randint(0, 1 << 30, n, np.int32))
        timed(f"copy_{mb}MB", jax.jit(lambda a: a + 1), x)

    S, M = 30, 1 << 17          # per-slice batched domain (~3.93M)
    N = S * M
    flat_key = jnp.asarray(rng.randint(0, 1 << 30, N, np.int32))
    b_key = flat_key.reshape(S, M)
    pay = [jnp.asarray(rng.randint(0, 1 << 30, N, np.int32))
           for _ in range(3)]

    for nops in (1, 2, 3):
        f = jax.jit(lambda k, *w: jax.lax.sort((k, *w), num_keys=1))
        timed(f"flat_sort_3.9M_key+{nops}",
              f, flat_key, *pay[:nops])

    for nops in (1, 2, 3):
        f = jax.jit(lambda k, *w: jax.lax.sort((k, *w), num_keys=1,
                                               dimension=1))
        timed(f"batched_sort_30x128K_key+{nops}",
              f, b_key, *[p.reshape(S, M) for p in pay[:nops]])

    # smaller batched rows (the layout sort shape: M ~ 112K padded)
    S2, M2 = 30, 1 << 16
    k2 = jnp.asarray(rng.randint(0, 1 << 30, (S2, M2), np.int32))
    p2 = jnp.asarray(rng.randint(0, 1 << 30, (S2, M2), np.int32))
    f2 = jax.jit(lambda k, w: jax.lax.sort((k, w), num_keys=1, dimension=1))
    timed("batched_sort_30x64K_key+1", f2, k2, p2)

    # pallas bitonic row sorter on the batched shape
    from ffmpeg_ffv2_tpu.ops.sort_pallas import sort_rows_pallas
    for nops in (1, 3):
        f = lambda k, *w: sort_rows_pallas((k, *w), num_keys=1)
        timed(f"pallas_rowsort_30x128K_key+{nops}",
              f, b_key, *[p.reshape(S, M) for p in pay[:nops]])

    # 64-bit single-operand alternative (key<<32 | payload)
    k64 = (flat_key.astype(jnp.int64) << 32) | pay[0].astype(jnp.int64)
    f64 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1))
    try:
        timed("flat_sort_3.9M_i64", f64, k64)
    except Exception as e:
        P(f"flat_sort_3.9M_i64: FAILED {type(e).__name__}")

    # batched with 4 frames stacked (the encode_batch shape)
    S4 = 4 * S
    k4 = jnp.asarray(rng.randint(0, 1 << 30, (S4, M), np.int32))
    p4 = jnp.asarray(rng.randint(0, 1 << 30, (S4, M), np.int32))
    f4 = jax.jit(lambda k, w: jax.lax.sort((k, w), num_keys=1, dimension=1))
    timed("batched_sort_120x128K_key+1", f4, k4, p4)

    P("done")


if __name__ == "__main__":
    main()
