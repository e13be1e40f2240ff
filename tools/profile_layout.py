#!/usr/bin/env python3
"""Break layout_plan's cost into its internal passes on the chip.

Times each structural piece of the layout at the 1080p/30 shape by
compiling cumulative prefixes of the computation (piece N's cost =
prefix(N) - prefix(N-1)), so fusion effects inside a prefix match the
production program's.
"""

import functools
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
    P = functools.partial(print, flush=True)
    probe = jax.jit(lambda x: jnp.sum(x.ravel()[:128]))

    def sync(r):
        for x in jax.tree_util.tree_leaves(r):
            if hasattr(x, "ravel"):
                float(probe(x))
                return

    from ffmpeg_ffv2_tpu.ffv1.params import FFV1Config
    import ffmpeg_ffv2_tpu.ffv1.device_coder as dc

    slices = 30
    w, h = 1920, 1080
    cfg = FFV1Config(level=3, coder=1, slices=slices)
    dev = dc.DeviceFFV1Encoder(w, h, "yuv420p", cfg, use_pallas=True)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 2) % 256 // 8 * 8).astype(np.int32)
    rng = np.random.RandomState(0)
    noise = rng.randint(0, 4, (h, w)).astype(np.int32)
    cyy, cxx = np.mgrid[0:h // 2, 0:w // 2]
    cb = ((cxx + cyy) % 256).astype(np.int32)
    planes = [jnp.asarray((base + noise) & 0xFF), jnp.asarray(cb),
              jnp.asarray((cb * 2) & 0xFF)]
    ctx, diff = dev._phase_a(planes)
    row_local = jnp.asarray(dev.class_off_stream)[None, :] + ctx
    row_local = jax.block_until_ready(row_local)
    diff = jax.block_until_ready(diff)

    tiny = jax.jit(lambda x: x[:1, :1] + 1)
    sync(tiny(diff))
    t0 = time.perf_counter()
    for _ in range(3):
        sync(tiny(diff))
    rtt = (time.perf_counter() - t0) / 3
    P(f"rtt {rtt * 1e3:.1f} ms")

    rows_per_slice = dev.rows_per_slice
    tiles_cap = dev.tiles_cap
    slots_cap = tiles_cap * 128

    i32 = jnp.int32
    S, npix = row_local.shape
    G = S * rows_per_slice
    M = npix + rows_per_slice
    B = max(int(npix).bit_length(), 1)
    drop = jnp.iinfo(i32).max

    def upto(stage):
        @functools.partial(jax.jit, static_argnames=())
        def f(row_local, diff):
            gq = jnp.arange(rows_per_slice, dtype=i32)[None, :]
            pidx = jnp.arange(npix, dtype=i32)[None, :]
            diff_m = jnp.concatenate(
                [diff, jnp.zeros((S, rows_per_slice), i32)], axis=1)
            key = jnp.concatenate(
                [(row_local << B) | (pidx + 1),
                 jnp.broadcast_to(gq << B, (S, rows_per_slice))], axis=1)
            if stage == "sort1":
                return key, diff_m
            key, diff_s = jax.lax.sort((key, diff_m), num_keys=1,
                                       dimension=1)
            if stage == "sort1_done":
                return key, diff_s
            row_s = key >> B
            sidx = key & ((1 << B) - 1)
            is_sent = sidx == 0
            pidx2 = jnp.arange(M, dtype=i32)[None, :]
            st = jax.lax.cummax(jnp.where(is_sent, pidx2, -1), axis=1)
            r = pidx2 - st - 1
            if stage == "cummax":
                return r, diff_s
            sent_key = jnp.where(is_sent, row_s, drop)
            _, sent_pos = jax.lax.sort(
                (sent_key, pidx2 + jnp.zeros((S, 1), i32)),
                num_keys=1, dimension=1)
            spos = sent_pos[:, :rows_per_slice]
            if stage == "sort2":
                return r, spos
            # group-domain class ordering
            nxt_spos = jnp.concatenate(
                [spos[:, 1:], jnp.full((S, 1), M, i32)], axis=1)
            size_g = nxt_spos - spos - 1
            size_f = size_g.reshape(-1)
            nsb = (size_f + dc.GCAP - 1) // dc.GCAP
            is_bucket = (nsb > 1) | (size_f == dc.GCAP)
            ckey = jnp.where(is_bucket, -nsb, (1 << 30) + (dc.GCAP - size_f))
            ckey_s, g_sorted, nsb_sorted, size_sorted = jax.lax.sort(
                (ckey, jnp.arange(G, dtype=i32), nsb, size_f),
                num_keys=1, is_stable=True)
            if stage == "groupsort":
                return ckey_s, g_sorted
            # forward-fill delivery (the wfill associative scan)
            w_tab = jnp.zeros(G, i32).at[g_sorted].set(
                jnp.arange(G, dtype=i32), unique_indices=True)
            sent_at = (jnp.arange(S, dtype=i32)[:, None] * M
                       + spos).reshape(-1)
            wfill = jnp.full(S * M, -1, i32).at[sent_at].set(
                w_tab, mode="drop", unique_indices=True).reshape(S, M)
            wfill = jax.lax.associative_scan(
                lambda a, b: jnp.where(b < 0, a, b), wfill, axis=1)
            if stage == "wfill":
                return wfill, r
            return wfill, r
        return f

    prev = 0.0
    for stage in ["sort1", "sort1_done", "cummax", "sort2", "groupsort",
                  "wfill"]:
        f = upto(stage)
        r = f(row_local, diff)
        sync(r)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            r = f(row_local, diff)
            sync(r)
            ts.append(time.perf_counter() - t0)
        cur = max(min(ts) - rtt, 0.0) * 1e3
        P(f"{stage}: cumulative {cur:.1f} ms (+{cur - prev:.1f})")
        prev = cur

    # and the production layout for reference
    f = lambda: dev._s_layout(ctx, diff, dev.tiles_cap, dev.cellrows_cap)
    r = f()
    sync(r)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        sync(f())
        ts.append(time.perf_counter() - t0)
    P(f"full layout: {max(min(ts) - rtt, 0.0) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
