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
    coder = 0 if os.environ.get("PROF_CODER", "range") == "rice" else 1
    w, h = 1920, 1080
    cfg = FFV1Config(level=3, coder=coder, slices=slices)
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

    if coder == 0:
        # golomb-rice stage profile (the FATE-default coder)
        ctx, streams = timed("phase_a_rice", dev._phase_a_rice, planes)
        plan = timed("rice_layout", lambda *a: dev._s_rice_layout(*a),
                     ctx, streams["payload"], dev.tiles_cap,
                     dev.cellrows_cap)
        ch1c, ch2c = timed("scatter", lambda *a: dev._s_scatter(*a),
                           plan, dev.cellrows_cap)
        code_cells, vcanon, psizes = timed(
            "vlc_walk", lambda *a: dev._s_vlc_walk(*a),
            ch1c, plan, dev.vcanon, True, dev.tiles_cap)
        vlc_codes = timed("rice_unsort", lambda *a: dev._s_rice_unsort(*a),
                          code_cells, ch2c, dev.S, dev.sortrows_cap)
        by, nbits, n_lad = timed("rice_bits", lambda *a: dev._s_rice_bits(*a),
                                 streams, vlc_codes, dev.ev_cap, dev.nwords)
        P("done")
        return

    B = int(os.environ.get("PROF_BATCH", "0"))
    if B > 1:
        # batched (all-intra) pipeline stage profile at batch size B
        frames = []
        for t in range(B):
            frames.append([jnp.asarray((base + noise + 7 * t) & 0xFF),
                           jnp.asarray((cb + t) & 0xFF),
                           jnp.asarray((cb * 2 + 3 * t) & 0xFF)])
        st = dev._batch_state(B)
        caps = (st["tiles"], st["cellrows"], dev.op_cap, st["sort"])
        parts = timed("phase_a_xB", lambda fs: [dev._phase_a(f) for f in fs],
                      frames)
        cat = timed("concat", lambda ps: (
            jnp.concatenate([c for c, _ in ps], axis=0),
            jnp.concatenate([d for _, d in ps], axis=0)), parts)
        ctx, diff = cat
        svp, btp, hlen = dev.prefix[True]
        svpB, btpB, hlenB = (jnp.tile(svp, (B, 1)), jnp.tile(btp, (B, 1)),
                             jnp.tile(hlen, B))
        opw_nops = timed(
            "ops_from_streams", lambda *a: dev.ops_from_streams(*a),
            ctx, diff, st["canon"], svpB, btpB, hlenB, True, caps,
            dev.unsort_words)
        opw, n_ops, _, sizes = opw_nops
        steps = int(opw.shape[1])
        P(f"steps={steps} lanes={opw.shape[0]}")
        fcv = timed("coder", lambda *a: dev._coder_jit(*a), opw, steps)
        f, c, v = fcv
        by = timed("render", lambda *a: dev._render_jit(*a),
                   f, c, v, B * slices, steps, dev.render_cap, True)
        # dispatch-only probe: host cost of queueing one full batch step
        # (no sync) — the per-frame overhead encode() pays beyond device
        # compute
        def whole(fs):
            parts = [dev._phase_a(f) for f in fs]
            ctx = jnp.concatenate([c for c, _ in parts], axis=0)
            diff = jnp.concatenate([d for _, d in parts], axis=0)
            opw, n_ops, _, sizes = dev.ops_from_streams(
                ctx, diff, st["canon"], svpB, btpB, hlenB, True, caps,
                dev.unsort_words)
            by, ln, fcm = dev._code_render(opw, steps, dev.render_cap)
            return by, ln, fcm, sizes
        r = whole(frames)
        sync(r)
        t0 = time.perf_counter()
        r = whole(frames)
        t_disp = time.perf_counter() - t0
        sync(r)
        t_all = time.perf_counter() - t0
        P(f"dispatch-only (1 batch, host): {t_disp * 1e3:.1f} ms")
        P(f"dispatch+sync (1 batch): {t_all * 1e3:.1f} ms")
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r1 = whole(frames)
            r2 = whole(frames)
            sync(r1)
            sync(r2)
            ts.append((time.perf_counter() - t0) / 2)
        P(f"steady per-batch (2 queued): {min(ts) * 1e3:.1f} ms "
          f"({B * w * h / min(ts) / 1e6:.1f} Mpix/s)")
        P("done")
        return

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
