#!/usr/bin/env python3
"""Unsort decomposition on REAL pipeline data (not random keys —
XLA's TPU sort is strongly data-dependent: the production cell
order is piecewise-sorted by stream index, ~10x faster than random).

Measures, at the production 1080p/30 shape:
  * repack_emission_order alone
  * global 1-D lax.sort, key + W payloads, W in {1, 5}
  * per-slice batched lax.sort on the same records re-partitioned by
    slice (what a slice-segmented tile layout would feed it)
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
    from ffmpeg_ffv2_tpu.ffv1.params import FFV1Config
    import ffmpeg_ffv2_tpu.ffv1.device_coder as dc

    P = functools.partial(print, flush=True)
    probe = jax.jit(lambda x: jnp.sum(x.ravel()[:128]))

    def sync(r):
        for x in jax.tree_util.tree_leaves(r):
            if hasattr(x, "ravel"):
                float(probe(x))
                return

    def timed(name, fn, *args, n=4):
        r = fn(*args)
        sync(r)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn(*args)
            sync(r)
            ts.append(time.perf_counter() - t0)
        P(f"{name}: {min(ts) * 1e3:.1f} ms")
        return r

    S = 30
    w, h = 1920, 1080
    cfg = FFV1Config(level=3, coder=1, slices=S)
    dev = dc.DeviceFFV1Encoder(w, h, "yuv420p", cfg, use_pallas=True)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 2) % 256 // 8 * 8).astype(np.int32)
    rng = np.random.RandomState(0)
    noise = rng.randint(0, 4, (h, w)).astype(np.int32)
    cyy, cxx = np.mgrid[0:h // 2, 0:w // 2]
    cb = ((cxx + cyy) % 256).astype(np.int32)
    planes = [jnp.asarray((base + noise) & 0xFF), jnp.asarray(cb),
              jnp.asarray((cb * 2) & 0xFF)]

    caps = (dev.tiles_cap, dev.cellrows_cap, dev.op_cap, dev.sortrows_cap)
    tiles_cap, cellrows_cap, op_cap, sortrows_cap = caps
    ctx, diff = dev._phase_a(planes)
    plan = dev._s_layout(ctx, diff, tiles_cap, cellrows_cap)
    ch1c, ch2c = dev._s_scatter(plan, cellrows_cap)
    s0 = dev._s_s0(plan, jnp.full_like(dev.canonical, 128), tiles_cap)
    sv_words, ends = dev._adapt(ch1c, plan, s0, tiles_cap, cellrows_cap)

    scap = sortrows_cap
    npix = dev.npix
    n = S * npix

    @jax.jit
    def repack_only(sv_words, ch1c):
        diff_c = (ch1c[:scap] & 0x1FFF) - 2048
        return dc.repack_emission_order(sv_words[:scap], diff_c,
                                        dev.code_bits)

    ev = timed("repack_emission_order", repack_only, sv_words, ch1c)
    nw = ev.shape[1]
    words = [ev[:, j, :].reshape(scap * 128) for j in range(nw)]
    keys = ch2c[:scap].reshape(scap * 128)

    f_sort = jax.jit(lambda k, *p: jax.lax.sort((k, *p), num_keys=1))
    timed(f"global sort W={nw} (prod data, {scap*128})", f_sort,
          keys, *words)
    timed("global sort W=1 (prod data)", f_sort, keys, words[0])

    # slice-partitioned variant: per-slice rows, slice-local keys,
    # realistic per-slice cap (pow2 padding)
    keys_h = np.asarray(keys)
    words_h = [np.asarray(wd) for wd in words]
    cap = 1 << int(np.ceil(np.log2(npix * 9 / 8)))
    bk = np.full((S, cap), np.iinfo(np.int32).max, np.int32)
    bw = [np.zeros((S, cap), np.int32) for _ in range(nw)]
    for s in range(S):
        m = (keys_h >= s * npix) & (keys_h < (s + 1) * npix)
        idx = np.nonzero(m)[0]
        bk[s, :len(idx)] = keys_h[idx] - s * npix
        for j in range(nw):
            bw[j][s, :len(idx)] = words_h[j][idx]
    bk_d = jnp.asarray(bk)
    bw_d = [jnp.asarray(x) for x in bw]
    f_bsort = jax.jit(lambda k, *p: jax.lax.sort((k, *p), num_keys=1,
                                                 dimension=1))
    timed(f"batched sort (S={S},cap={cap}) W={nw} (prod data)",
          f_bsort, bk_d, *bw_d)
    timed(f"batched sort (S={S},cap={cap}) W=1 (prod data)",
          f_bsort, bk_d, bw_d[0])


if __name__ == "__main__":
    main()
