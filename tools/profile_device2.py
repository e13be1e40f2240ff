#!/usr/bin/env python3
"""Split-jit timing of the device pipeline: front (phase A + layout +
scatter + adapt + writeback) vs back (unsort + emission + compaction +
overlay) vs coder+render, each as one jitted program on the chip.

Complements profile_device.py (per-stage, eager-dispatch): the split
isolates whether the monolithic program loses time to fusion/remat
rather than to any single stage."""

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

    def timed(fn, args, n=4, rtt=0.0):
        r = fn(*args)
        sync(r)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn(*args)
            sync(r)
            ts.append(time.perf_counter() - t0)
        return max(min(ts) - rtt, 0.0)

    w, h = 1920, 1080
    cfg = FFV1Config(level=3, coder=1, slices=30)
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
    P(f"rtt {rtt * 1e3:.1f} ms")

    caps = (dev.tiles_cap, dev.cellrows_cap, dev.op_cap, dev.sortrows_cap)
    tiles_cap, cellrows_cap, op_cap, sortrows_cap = caps
    canon = dev.canonical

    @jax.jit
    def front(planes, canonical):
        ctx, diff = dev._phase_a(planes)
        row_local = jnp.asarray(dev.class_off_stream)[None, :] + ctx
        plan = dc.layout_plan(row_local, diff, dev.rows_per_slice,
                              tiles_cap * 128, tiles_cap)
        lim = cellrows_cap - 1024
        plan["tile_bases"] = jnp.minimum(plan["tile_bases"], lim)
        plan["tile_caps"] = jnp.minimum(plan["tile_caps"],
                                        lim - plan["tile_bases"])
        ch1c, ch2c = dc.scatter_cells(plan, cellrows_cap)
        canonical = jnp.full_like(canonical, 128)
        s0 = dc.build_s0_blocks(plan, canonical, tiles_cap)
        sv_words, ends = dev._adapt(ch1c, plan, s0, tiles_cap,
                                    cellrows_cap)
        canonical = dc.writeback_canonical(plan, canonical, ends,
                                           tiles_cap)
        return sv_words, ch2c, diff, canonical

    @jax.jit
    def back(sv_words, ch2c, diff):
        i32 = jnp.int32
        svp, btp, hlen = dev.prefix[True]
        n_slices = 30
        n = n_slices * dev.npix
        scap = sortrows_cap
        words = [sv_words[:scap, j, :].reshape(scap * 128)
                 for j in range(8)]
        keys = ch2c[:scap].reshape(scap * 128)
        sorted_ops = jax.lax.sort((keys, *words), num_keys=1)
        words_n = [wd[:n].reshape(n_slices, dev.npix)
                   for wd in sorted_ops[1:]]
        slot, bit, valid = dc.emission_slots(diff, dev.k_max)
        wsel, shf = slot >> 2, (slot & 3) * 8
        sv_em = jnp.zeros_like(slot)
        for j in range(8):
            sv_em = jnp.where(wsel == j, words_n[j][..., None], sv_em)
        sv_em = (sv_em >> shf) & 0xFF
        counts = dc.event_count(diff)
        koff = jnp.cumsum(counts, axis=1)
        total = hlen + koff[:, -1]
        off = (hlen[:, None, None] + (koff - counts)[..., None]
               + jnp.arange(dev.k_max, dtype=i32)[None, None, :])
        hpad = int(svp.shape[1])
        m = hpad + dev.npix * dev.k_max
        idxg = jnp.arange(m - hpad, dtype=i32).reshape(
            dev.npix, dev.k_max)[None]
        delta = jnp.where(valid, idxg + hpad - off, 0)
        packed = jnp.where(valid,
                           (delta << 10) | (1 << 9) | (bit << 8) | sv_em, 0)
        packed = jnp.concatenate(
            [jnp.zeros((n_slices, hpad), i32),
             packed.reshape(n_slices, -1)], axis=1)
        packed = dc.shift_compact_packed(packed, op_cap)
        sv_st = packed & 0xFF
        bit_st = (packed >> 8) & 1
        validc = (packed & (1 << 9)) != 0
        pos = jnp.arange(op_cap, dtype=i32)[None, :]
        in_hdr = pos < hlen[:, None]
        hsv = jnp.pad(svp, ((0, 0), (0, max(0, op_cap - svp.shape[1])))
                      )[:, :op_cap]
        hbt = jnp.pad(btp, ((0, 0), (0, max(0, op_cap - btp.shape[1])))
                      )[:, :op_cap]
        sv_st = jnp.where(in_hdr, hsv, sv_st)
        bit_st = jnp.where(in_hdr, hbt, bit_st)
        term = pos == total[:, None]
        sv_st = jnp.where(term, dc.TERMINATOR_SV, sv_st)
        bit_st = jnp.where(term, 0, bit_st)
        mode = jnp.where(in_hdr | validc | term, dc.MODE_OP,
                jnp.where(pos == total[:, None] + 1, dc.MODE_FLUSH1,
                jnp.where(pos == total[:, None] + 2, dc.MODE_FLUSH2,
                          dc.MODE_NOP)))
        return sv_st, bit_st, mode, total + 3

    t_front = timed(front, (planes, canon), rtt=rtt)
    sv_words, ch2c, diff, _ = front(planes, canon)
    P(f"front (phaseA+layout+scatter+adapt+wb) {t_front*1e3:8.1f} ms")
    t_back = timed(back, (sv_words, ch2c, diff), rtt=rtt)
    P(f"back (unsort+emit+compact+overlay)     {t_back*1e3:8.1f} ms")
    sv, bit, mode, n_ops = back(sv_words, ch2c, diff)

    def cr(sv, bit, mode):
        return dev._code_render(sv, bit, mode, op_cap, dev.render_cap)
    t_cr = timed(cr, (sv, bit, mode), rtt=rtt)
    P(f"coder+render ({op_cap} steps)           {t_cr*1e3:8.1f} ms")

    def full(planes, canonical):
        sv, bit, mode, n_ops, canon2, sizes = dev._pipeline(
            planes, canonical, True, caps)
        by, ln, fcm = dev._code_render(sv, bit, mode, op_cap,
                                       dev.render_cap)
        return by, ln, fcm
    t_full = timed(full, (planes, canon), rtt=rtt)
    P(f"monolithic pipeline+coder+render       {t_full*1e3:8.1f} ms")
    P(f"split total {((t_front+t_back+t_cr))*1e3:8.1f} ms")
    tot = t_full
    P(f"=> {w*h/tot/1e6:.1f} Mpix/s monolithic, "
      f"{w*h/(t_front+t_back+t_cr)/1e6:.1f} Mpix/s split")


if __name__ == "__main__":
    main()
