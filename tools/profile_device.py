#!/usr/bin/env python3
"""Per-stage timing of the on-device FFV1 encode pipeline.

Times each jitted stage separately on the current backend (RTT-corrected
through the dev tunnel), printing a table that attributes the end-to-end
frame time to: phase A, layout, cell scatter, s0 blocks, adapt kernel,
unsort, emission+compaction, rac coder.  This is the observability tool
behind docs/ARCHITECTURE.md's stage profile.
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


_probe = None


def timed(fn, args, n=5, rtt=0.0):
    """min wall time of fn(*args) with a 1-scalar fetch sync, minus rtt.

    axon's block_until_ready does not reliably wait; fetching a scalar
    derived from the first output leaf forces completion of the whole
    dispatch queue (ops run in order)."""
    r = fn(*args)
    sync(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        sync(r)
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - rtt, 0.0)


def sync(r):
    global _probe
    if _probe is None:
        _probe = jax.jit(lambda x: jnp.sum(x.ravel()[:128]))
    for x in jax.tree_util.tree_leaves(r):
        if hasattr(x, "ravel"):
            float(_probe(x))
            return
    return


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    from ffmpeg_ffv2_tpu.ffv1.params import FFV1Config
    from ffmpeg_ffv2_tpu.ffv1.device_coder import (
        DeviceFFV1Encoder, layout_plan, scatter_cells, build_s0_blocks,
        GCAP)

    w, h = 1920, 1080
    cfg = FFV1Config(level=3, coder=1, slices=30)
    dev = DeviceFFV1Encoder(w, h, "yuv420p", cfg, use_pallas=True)
    p = dev.p

    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 2) % 256 // 8 * 8).astype(np.int32)
    rng = np.random.RandomState(0)
    noise = rng.randint(0, 4, (h, w)).astype(np.int32)
    cyy, cxx = np.mgrid[0:h // 2, 0:w // 2]
    cb = ((cxx + cyy) % 256).astype(np.int32)
    planes = [jnp.asarray((base + noise) & 0xFF), jnp.asarray(cb),
              jnp.asarray((cb * 2) & 0xFF)]

    # RTT of a trivial dispatch+sync
    tiny = jax.jit(lambda x: x[:1, :1] + 1)
    sync(tiny(planes[0]))
    t0 = time.perf_counter()
    for _ in range(3):
        sync(tiny(planes[0]))
    rtt = (time.perf_counter() - t0) / 3
    print(f"backend={jax.default_backend()} rtt={rtt * 1e3:.2f} ms")

    caps = (dev.tiles_cap, dev.cellrows_cap, dev.op_cap)
    tiles_cap, cellrows_cap, op_cap = caps

    # stage 0: phase A
    pa = jax.jit(dev._phase_a)
    t_pa = timed(pa, (planes,), rtt=rtt)
    ctx, diff = pa(planes)

    rows = ctx + jnp.asarray(dev.class_off_stream)[None, :]

    # stage 1: layout
    lp = jax.jit(functools.partial(layout_plan,
                                   rows_per_slice=dev.rows_per_slice,
                                   slots_cap=tiles_cap * 128,
                                   tiles_cap=tiles_cap))
    t_lay = timed(lp, (rows, diff), rtt=rtt)
    plan = jax.block_until_ready(lp(rows, diff))

    # stage 2: cell scatter
    sc = jax.jit(functools.partial(scatter_cells, cellrows_cap=cellrows_cap))
    t_sc = timed(sc, (plan,), rtt=rtt)
    ch1c, _ = sc(plan)

    # stage 3: s0 blocks
    s0f = jax.jit(functools.partial(build_s0_blocks, tiles_cap=tiles_cap))
    t_s0 = timed(s0f, (plan, dev.canonical), rtt=rtt)
    s0 = s0f(plan, dev.canonical)

    # stage 4: adapt kernel
    ad = functools.partial(dev._adapt, tiles_cap=tiles_cap,
                           cellrows_cap=cellrows_cap)
    t_ad = timed(ad, (ch1c, plan, s0), rtt=rtt)

    # stage 5..: full pipeline (for the residual)
    def full(planes, canon):
        return dev._pipeline(planes, canon, True, caps)
    t_full = timed(full, (planes, dev.canonical), rtt=rtt)

    # stage 6: the arithmetic coder the bench runs on the op streams
    from ffmpeg_ffv2_tpu.ffv1.pallas_coder import rac_pallas_lanes
    sv, bit, mode, n_ops, canon, sizes = full(planes, dev.canonical)

    @jax.jit
    def b3(sv, bit, mode):
        svT = jnp.pad(sv.T, ((0, 0), (0, 128 - sv.shape[0])))
        btT = jnp.pad(bit.T, ((0, 0), (0, 128 - sv.shape[0])))
        mdT = jnp.pad(mode.T, ((0, 0), (0, 128 - sv.shape[0])))
        f, c, v = rac_pallas_lanes(svT, btT, mdT)
        return jnp.sum(c) + jnp.sum(f[0])
    t_rac = timed(b3, (sv, bit, mode), rtt=rtt)

    print(f"phase A        {t_pa * 1e3:9.1f} ms")
    print(f"layout         {t_lay * 1e3:9.1f} ms")
    print(f"cell scatter   {t_sc * 1e3:9.1f} ms")
    print(f"s0 blocks      {t_s0 * 1e3:9.1f} ms")
    print(f"adapt kernel   {t_ad * 1e3:9.1f} ms")
    resid = t_full - (t_pa + t_lay + t_sc + t_s0 + t_ad)
    print(f"unsort+emit+compact (residual) {resid * 1e3:9.1f} ms")
    print(f"rac coder (pallas, {int(sv.shape[1])} steps) "
          f"{t_rac * 1e3:9.1f} ms")
    tot = t_full + t_rac
    print(f"TOTAL pipeline+coder {tot * 1e3:9.1f} ms "
          f"= {w * h / tot / 1e6:.1f} Mpix/s")


if __name__ == "__main__":
    main()
