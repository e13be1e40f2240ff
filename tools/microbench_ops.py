#!/usr/bin/env python3
"""Micro-benchmarks of the data-movement primitives the device pipeline
leans on (gather / scatter / sort / cummax at pipeline-realistic shapes),
RTT-corrected.  Guides which stages are worth a Pallas replacement."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import jax
import jax.numpy as jnp


RTT = [0.0]


def bench(name, fn, *args, n=5):
    # axon's block_until_ready does not wait; force a 1-scalar fetch
    # (full-sum so nothing DCEs; adds one read pass over the output)
    fn_j = jax.jit(lambda *a: jnp.sum(fn(*a)))
    float(fn_j(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    dt = max(min(ts) - RTT[0], 0.0)
    print(f"{name:46s} {dt * 1e3:9.2f} ms")
    return min(ts)


def main():
    rng = np.random.RandomState(0)
    S, npix = 30, 103680
    G = 112260 // 30 * 30
    rows_ps = 3742
    OC = 417280
    n = S * npix
    cells = 145000 * 128

    key = jnp.asarray(rng.randint(0, rows_ps, (S, npix)), jnp.int32)
    big_u8 = jnp.asarray(rng.randint(0, 255, cells * 32 // 128,), jnp.uint8)
    gidx = jnp.asarray(rng.randint(0, cells * 32 // 128, (S, OC)), jnp.int32)
    pixi = jnp.asarray(rng.randint(0, npix, (S, OC)), jnp.int32)
    small = jnp.asarray(rng.randint(0, 1 << 20, (S, rows_ps)), jnp.int32)
    vals = jnp.asarray(rng.randint(0, 1 << 20, (S, npix)), jnp.int32)
    dest = jnp.asarray(rng.permutation(n), jnp.int32)

    # one tiny op for RTT
    RTT[0] = bench("rtt (tiny)", lambda x: x[:1, :1] + 1, key)

    bench("sort 1ch (30,104K) packed", lambda x: jax.lax.sort(
        (x << 14) | jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % 16384,
        dimension=1), key)
    bench("sort 1ch unstable (30,104K)",
          lambda x: jax.lax.sort(x, dimension=1), key)
    bench("sort 3ch stable (30,104K)", lambda x, v: jax.lax.sort(
        (x, v, v), num_keys=1, is_stable=True, dimension=1)[0], key, vals)
    bench("gather u8 (S,OC)<-594MB tbl", lambda t, i: jnp.take(t, i), big_u8,
          gidx)
    bench("gather i32 (S,OC)<-(S,npix) tal",
          lambda v, i: jnp.take_along_axis(v, i, axis=1), vals, pixi)
    bench("gather i32 (S,npix)<-(S,rows) tal",
          lambda v, i: jnp.take_along_axis(v, jnp.abs(i) % rows_ps, axis=1),
          small, key)
    bench("scatter i32 n->n (perm)",
          lambda d, v: jnp.zeros(n, jnp.int32).at[d].set(
              v.reshape(-1), unique_indices=True, mode="drop"), dest, vals)
    bench("scatter i32 n->cells",
          lambda d, v: jnp.zeros(cells, jnp.int32).at[d * 4].set(
              v.reshape(-1), unique_indices=True, mode="drop"), dest, vals)
    bench("cummax (S,OC)", lambda x: jax.lax.cummax(x, axis=1),
          jnp.asarray(rng.randint(0, 99, (S, OC)), jnp.int32))
    bench("cumsum (S,npix)", lambda x: jnp.cumsum(x, axis=1), vals)
    bench("searchsorted (S,rows+1)<-(S,npix)",
          lambda k: jax.vmap(lambda kk: jnp.searchsorted(
              kk, jnp.arange(rows_ps + 1, dtype=jnp.int32) << 14,
              side="left"))(jax.lax.sort((k << 14), dimension=1)), key)
    # elementwise roofline reference
    bench("elementwise 20 ops (S,OC)",
          lambda x: ((x * 3 + 1) ^ (x >> 2)) * ((x | 1) + (x & 7))
          + ((x * 5) ^ (x >> 3)) + ((x * 7) ^ (x >> 4)),
          jnp.asarray(rng.randint(0, 99, (S, OC)), jnp.int32))

    # --- candidates for the gather-free pipeline ---
    tight_cells = (n // 128 + 6144) * 128
    svb = jnp.asarray(rng.randint(0, 255, (tight_cells, 32)), jnp.uint8)
    inv = jnp.asarray(rng.randint(0, tight_cells, n), jnp.int32)
    bench("row-gather u8 (n,32)<-tight cells",
          lambda t, i: jnp.take(t, i, axis=0).astype(jnp.int32), svb, inv)
    svw = jnp.asarray(rng.randint(0, 1 << 30, (tight_cells, 8)), jnp.int32)
    bench("row-gather i32 (n,8)<-tight cells",
          lambda t, i: jnp.take(t, i, axis=0), svw, inv)
    ck = jnp.asarray(rng.permutation(tight_cells), jnp.int32)
    cw = [jnp.asarray(rng.randint(0, 1 << 30, tight_cells), jnp.int32)
          for _ in range(8)]
    bench("sort 9ch (tight cells)",
          lambda k, *w: jax.lax.sort((k, *w), num_keys=1,
                                     is_stable=True)[1], ck, *cw)
    fillv = jnp.asarray(
        np.where(rng.rand(S, OC) < 0.25, rng.randint(1, 1 << 30, (S, OC)),
                 -1), jnp.int32)
    bench("assoc_scan ffill (S,OC)",
          lambda x: jax.lax.associative_scan(
              lambda a, b: jnp.where(b < 0, a, b), x, axis=1), fillv)
    # packed single-channel shift-compact cost model: 21 passes over the
    # emission grid with one array
    em = jnp.asarray(rng.randint(0, 1 << 30, (S, npix * 17)), jnp.int32)

    def packed_shift(x):
        for b in range(21):
            step = 1 << b
            sh = jnp.concatenate(
                [x[..., step:], jnp.zeros(x.shape[:-1] + (step,), x.dtype)],
                axis=-1)
            x = jnp.where((sh & 1024) != 0, sh - 1024, x & ~(1 << b))
        return x
    bench("packed log-shift 21 passes (S,53M)", packed_shift, em)


if __name__ == "__main__":
    main()
