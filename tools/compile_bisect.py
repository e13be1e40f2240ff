#!/usr/bin/env python3
"""Bisect the layout_plan XLA:TPU compile blow-up (measured 557 s cold
at 1080p/30; the dominant term of the bench cold-wall).  Compiles
truncated variants of the layout graph and prints wall seconds per
piece.  Run stages individually: PIECE=sort|sent|class|tiles|slots|dest|full
(fresh process per piece so earlier compiles don't warm later ones —
the persistent cache is DISABLED here on purpose)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from ffmpeg_ffv2_tpu.ffv1 import device_coder as dc

    piece = os.environ.get("PIECE", "sort")
    S = int(os.environ.get("PROF_SLICES", "30"))
    npix = 3_110_400 // S
    rows_per_slice = int(os.environ.get("ROWS", "1338"))
    GCAP = dc.GCAP
    n = S * npix
    n_buckets = npix // GCAP + 2
    tiles_cap = (n // GCAP + 2 * n_buckets
                 + (S * rows_per_slice) // 128 + 8)
    M = npix + rows_per_slice
    i32 = jnp.int32

    def body(row_local, diff):
        B = max(int(npix).bit_length(), 1)
        drop = jnp.iinfo(i32).max
        nsb_cap = npix // GCAP + 2
        pidx = jnp.arange(npix, dtype=i32)[None, :]
        gq = jnp.arange(rows_per_slice, dtype=i32)[None, :]
        diff_m = jnp.concatenate(
            [diff, jnp.zeros((S, rows_per_slice), i32)], axis=1)
        key = jnp.concatenate(
            [(row_local << B) | (pidx + 1),
             jnp.broadcast_to(gq << B, (S, rows_per_slice))], axis=1)
        key, diff_s = jax.lax.sort((key, diff_m), num_keys=1, dimension=1)
        row_s = key >> B
        sidx = key & ((1 << B) - 1)
        if piece == "sort":
            return key, diff_s
        is_sent = sidx == 0
        pidx2 = jnp.arange(M, dtype=i32)[None, :]
        st = jax.lax.cummax(jnp.where(is_sent, pidx2, -1), axis=1)
        r = pidx2 - st - 1
        spos = jax.lax.sort(jnp.where(is_sent, pidx2, drop),
                            dimension=1)[:, :rows_per_slice]
        nxt = jnp.concatenate([spos[:, 1:], jnp.full((S, 1), M, i32)],
                              axis=1)
        size_g = nxt - spos - 1
        if piece == "sent":
            return r, size_g
        G = S * rows_per_slice
        size_f = size_g.reshape(-1)
        nsb = (size_f + GCAP - 1) // GCAP
        is_bucket = (nsb > 1) | (size_f == GCAP)
        ckey = jnp.where(is_bucket, -nsb, (1 << 30) + (GCAP - size_f))
        ckey_s, g_sorted, nsb_sorted, size_sorted = jax.lax.sort(
            (ckey, jnp.arange(G, dtype=i32), nsb, size_f),
            num_keys=1, is_stable=True)
        if piece == "class":
            return ckey_s, g_sorted
        isb_sorted = ckey_s < 0
        Mb = jnp.sum(isb_sorted.astype(i32))
        rank_sorted = jnp.arange(G, dtype=i32) - jnp.where(isb_sorted, 0,
                                                           Mb)
        kk = jnp.arange(nsb_cap, dtype=i32)
        Mk = jnp.searchsorted(ckey_s, -kk, side="left").astype(i32)
        ntiles_k = -(-Mk // 128)
        base_k = jnp.cumsum(ntiles_k) - ntiles_k
        n_bucket_tiles = jnp.sum(ntiles_k)
        T = jnp.arange(tiles_cap, dtype=i32)
        isbt = T < n_bucket_tiles
        k_of_T = jnp.clip(jnp.searchsorted(base_k, T, side="right") - 1,
                          0, nsb_cap - 1)
        nidx = Mb + 128 * (T - n_bucket_tiles)
        ncap = jnp.where((nidx >= Mb) & (nidx < G),
                         jnp.take(size_sorted, jnp.clip(nidx, 0, G - 1)),
                         0)
        tile_caps = jnp.where(isbt, GCAP, ncap)
        tile_bases = jnp.cumsum(tile_caps) - tile_caps
        if piece == "tiles":
            return tile_caps, tile_bases
        slot0 = jnp.where(isb_sorted, rank_sorted,
                          n_bucket_tiles * 128 + rank_sorted)
        last0 = ((nsb_sorted == 1) & (size_sorted > 0)).astype(i32)
        lane_packed0 = (g_sorted << 2) | last0
        lane_tab = jnp.zeros(tiles_cap * 128, i32).at[
            jnp.where(slot0 < tiles_cap * 128, slot0, drop)].set(
            lane_packed0, mode="drop", unique_indices=True)
        if piece == "slots":
            return lane_tab
        norm_tile = jnp.clip(n_bucket_tiles + (rank_sorted >> 7), 0,
                             tiles_cap - 1)
        cell0 = jnp.take(tile_bases, norm_tile) * 128 + (rank_sorted & 127)
        wprime = jnp.where(isb_sorted, (rank_sorted << 1) | 1, cell0 << 1)
        w_tab = jnp.zeros(G, i32).at[g_sorted].set(wprime,
                                                   unique_indices=True)
        sent_at = (jnp.arange(S, dtype=i32)[:, None] * M + spos).reshape(-1)
        wfill = jnp.full(S * M, -1, i32).at[sent_at].set(
            w_tab, mode="drop", unique_indices=True).reshape(S, M)
        wfill = jax.lax.associative_scan(
            lambda a, b: jnp.where(b < 0, a, b), wfill, axis=1)
        sb = r // GCAP
        t2 = r - sb * GCAP
        if int(nsb_cap) <= 48:
            bk = jnp.zeros_like(sb)
            for k in range(1, nsb_cap):
                bk = jnp.where(sb == k, base_k[k], bk)
        else:
            bk = jnp.take(base_k, jnp.clip(sb, 0, nsb_cap - 1))
        v = wfill >> 1
        dest_b = (GCAP * (bk + (v >> 7)) + t2) * 128 + (v & 127)
        dest = jnp.where(is_sent, drop,
                         jnp.where((wfill & 1) == 1, dest_b, v + r * 128))
        if piece == "dest":
            return dest
        return dest, diff_s, tile_caps, tile_bases

    row = jnp.zeros((S, npix), i32)
    diff = jnp.zeros((S, npix), i32)
    t0 = time.perf_counter()
    lowered = jax.jit(body).lower(row, diff)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"piece={piece} S={S}: trace+lower {t1-t0:.1f}s  "
          f"compile {t2-t1:.1f}s", flush=True)


if __name__ == "__main__":
    main()
