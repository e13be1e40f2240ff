#!/usr/bin/env python3
"""Round-5 sort-shape decisions: i64-packed single-operand sorts vs
int32 key+payload, flat vs per-slice batched, at the EXACT domains the
1080p device pipeline uses.

Pipeline sort inventory (profile_stages_r5_b1: layout 12.1 ms,
scatter(destsort) 9.1 ms, unsort 7.0 ms of a 56 ms frame):
  layout:   batched (S, npix+rows) sort of key=(row<<B)|sidx, payload diff
            -> candidate: ONE i64 (key 31b | diff 14b)
  destsort: flat (dest, ch1, orig) key+2
            -> candidate: ONE i64 (dest 22b | ch1 14b | orig-in-slice 22b
               needs 58b total)
  unsort:   flat (ch2, w0..w_{nw-1}) key+nw (nw up to 5)
            -> candidate: i64 (key|w0) + w1 payload + overflow tier

Needs jax_enable_x64 for the i64 variants; this process enables it.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    P = lambda *a: print(*a, flush=True)
    probe = jax.jit(lambda x: jnp.sum(x.ravel()[:128].astype(jnp.int32)))

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
    P(f"rtt {rtt*1e3:.1f} ms  (x64 on)")

    def timed(name, fn, *args):
        r = jax.jit(fn)(*args)
        sync(r)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            r = jax.jit(fn)(*args)
            sync(r)
            ts.append(time.perf_counter() - t0)
        P(f"{name}: {max(min(ts)-rtt,0)*1e3:.2f} ms")

    rng = np.random.RandomState(1)
    # 1080p yuv420p: 3.1M samples; S=30 -> 104k/slice, S=108 -> 28.8k
    n = 3_110_400
    for S in (30, 108):
        m = n // S
        k32 = jnp.asarray(rng.randint(0, 1 << 30, (S, m), np.int32))
        p32 = jnp.asarray(rng.randint(0, 1 << 14, (S, m), np.int32))
        q32 = jnp.asarray(rng.randint(0, 1 << 22, (S, m), np.int32))
        k64 = (k32.astype(jnp.int64) << 14) | p32.astype(jnp.int64)
        timed(f"batched_{S}x{m//1000}K_key+1_i32",
              lambda a, b: jax.lax.sort((a, b), num_keys=1, dimension=1),
              k32, p32)
        timed(f"batched_{S}x{m//1000}K_key+2_i32",
              lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1,
                                           dimension=1), k32, p32, q32)
        timed(f"batched_{S}x{m//1000}K_i64",
              lambda a: jax.lax.sort((a,), num_keys=1, dimension=1), k64)
        timed(f"batched_{S}x{m//1000}K_i64+1_i32",
              lambda a, b: jax.lax.sort((a, b), num_keys=1, dimension=1),
              k64, q32)
    kf = k32.reshape(-1)
    pf = p32.reshape(-1)
    qf = q32.reshape(-1)
    kf64 = (kf.astype(jnp.int64) << 14) | pf.astype(jnp.int64)
    timed("flat_3.1M_key+2_i32",
          lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1), kf, pf, qf)
    timed("flat_3.1M_i64",
          lambda a: jax.lax.sort((a,), num_keys=1), kf64)
    timed("flat_3.1M_i64+1_i32",
          lambda a, b: jax.lax.sort((a, b), num_keys=1), kf64, qf)
    # unsort candidates: key + 2..5 payload words over the padded cell
    # domain (~n/128*9/8 rows x 128)
    rows = n // 128 * 9 // 8
    ck = jnp.asarray(rng.randint(0, n, (rows * 128,), np.int32))
    ws = [jnp.asarray(rng.randint(-(1 << 31), (1 << 31) - 1,
                                  (rows * 128,), np.int64).astype(np.int32))
          for _ in range(5)]
    for nw in (2, 5):
        timed(f"unsort_flat_key+{nw}_i32",
              lambda k, *w: jax.lax.sort((k, *w), num_keys=1),
              ck, *ws[:nw])
    ck64 = (ck.astype(jnp.int64) << 32) | ws[0].astype(jnp.int64) & 0xFFFFFFFF
    timed("unsort_flat_i64+1_i32",
          lambda a, b: jax.lax.sort((a, b), num_keys=1), ck64, ws[1])
    P("done")


if __name__ == "__main__":
    main()
