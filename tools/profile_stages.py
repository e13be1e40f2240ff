#!/usr/bin/env python3
"""Per-stage timing of the PRODUCTION device-encoder dispatchers.

Unlike profile_device2.py (monolithic front/back jits compiled just for
profiling), this times the exact stage jits encode() uses, so every
compile lands in the persistent cache and later encode()/bench runs skip
it.  Safe to kill and re-run: completed stage compiles persist.
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

    slices = int(os.environ.get("PROF_SLICES", "30"))
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

    tiny = jax.jit(lambda x: x[:1, :1] + 1)
    sync(tiny(planes[0]))
    t0 = time.perf_counter()
    for _ in range(3):
        sync(tiny(planes[0]))
    rtt = (time.perf_counter() - t0) / 3
    P(f"slices={slices} rtt {rtt * 1e3:.1f} ms")

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        r = fn(*args)
        sync(r)
        P(f"  [compile+run {name}: {time.perf_counter() - t0:.1f}s]")
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            r = fn(*args)
            sync(r)
            ts.append(time.perf_counter() - t0)
        P(f"{name}: {max(min(ts) - rtt, 0.0) * 1e3:.1f} ms")
        return r

    caps = (dev.tiles_cap, dev.cellrows_cap, dev.op_cap, dev.sortrows_cap)
    tiles_cap, cellrows_cap, op_cap, sortrows_cap = caps
    canon = dev.canonical
    svp, btp, hlen = dev.prefix[True]

    ctx, diff = timed("phase_a", dev._phase_a, planes)
    plan = timed("layout", lambda *a: dev._s_layout(*a),
                 ctx, diff, tiles_cap, cellrows_cap)
    ch1c, ch2c = timed("scatter", lambda *a: dev._s_scatter(*a),
                       plan, cellrows_cap)
    canonk = jnp.full_like(canon, 128)
    s0 = timed("s0", lambda *a: dev._s_s0(*a), plan, canonk, tiles_cap)
    uw = int(os.environ.get("PROF_UNSORT_WORDS", "0")) or dev.unsort_words
    ev_cells, ends = timed("adapt", lambda *a: dev._adapt(*a),
                           ch1c, plan, s0, tiles_cap, cellrows_cap, uw)
    canon2, psizes = timed("writeback", lambda *a: dev._s_wb(*a),
                           plan, canonk, ends, tiles_cap)
    words_n, _ = timed("unsort", lambda *a: dev._s_unsort(*a),
                       ev_cells, ch1c, ch2c, slices, sortrows_cap)
    win, totals, n_ops = timed(
        "window", lambda *a: dev._s_window_jit(*a),
        words_n, diff, svp, btp, hlen, op_cap)
    hpad = int(svp.shape[1])
    from ffmpeg_ffv2_tpu.ffv1.expand_pallas import WBLK, expand_pallas
    nblk = -(-(hpad + dev.npix + 3) // 128) + WBLK
    C = len(words_n) + 2
    opw3 = timed("expand", lambda *a: expand_pallas(*a),
                 win, totals, op_cap // 128, nblk, C, len(words_n),
                 dev.code_bits)
    opw = opw3.reshape(slices, op_cap)
    steps = 1 << int(np.max(np.asarray(n_ops))).bit_length()
    steps = max(512, min(steps, int(opw.shape[1])))
    P(f"steps={steps} op_cap={op_cap}")
    fcv = timed("coder", lambda *a: dev._coder_jit(*a), opw, steps)
    f, c, v = fcv
    by = timed("render", lambda *a: dev._render_jit(*a),
               f, c, v, slices, steps, dev.render_cap, True)
    P("done")


if __name__ == "__main__":
    main()
