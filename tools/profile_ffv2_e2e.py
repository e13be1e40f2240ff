#!/usr/bin/env python3
"""FFV2 end-to-end stage profile at 512x512: where does the frame go?

The axon tunnel makes isolated stage timings unreliable (dispatch is
async; block_until_ready on a remote handle returns before bytes move),
so every number here is an end-to-end wall-time difference over fresh
frames:

  e2e         full NativeFFV2Encoder.encode (upload+front+fetch+EC)
  ec_host     host C++ Daala coder over prefetched quantized data
  front_probe device compute synced by a 1-element probe fetch (the
              device-resident formulation bench uses)
  transfers   e2e - ec_host - front_probe  (upload + packed fetch)

Prints one JSON line per stage plus the implied tunnel bandwidth and
the ceiling statement.  Run on the TPU rig:
python tools/profile_ffv2_e2e.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    from ffmpeg_ffv2_tpu.ffv2 import dsp
    from ffmpeg_ffv2_tpu.ffv2.native import (NativeFFV2Encoder, _pad_px,
                                             SB)
    from ffmpeg_ffv2_tpu.ffv2.tpu import _encode_front_q
    from ffmpeg_ffv2_tpu.ffv2.pvq import icbrt_array
    from ffmpeg_ffv2_tpu.ffv2.codec import FFV2Config

    w = h = 512
    qp = 16
    reps = 8
    yy, xx = np.mgrid[0:h, 0:w]

    def frame(t):
        return [((xx * (1 + k) + yy * 2 + 37 * t) % 256).astype(np.int64)
                for k in range(3)]

    enc = NativeFFV2Encoder(w, h, "yuv444p", FFV2Config(qp=qp))
    bands_l = tuple(dsp.band_starts(SB))
    pix = w * h / 1e6

    def emit(stage, ms, **extra):
        rec = {"stage": stage, "ms_per_frame": round(ms, 2),
               "mpix_s": round(pix / max(ms, 1e-6) * 1e3, 3)}
        rec.update(extra)
        print(json.dumps(rec), flush=True)
        return ms

    # full e2e over fresh frames (warm code path first)
    enc.encode(frame(-1))
    t0 = time.perf_counter()
    for t in range(reps):
        enc.encode(frame(t))
    e2e = emit("e2e_encode", (time.perf_counter() - t0) / reps * 1e3)

    # device front synced by a tiny probe (device-resident formulation)
    padded8 = np.stack([_pad_px(np.asarray(p), 8)
                        for p in frame(0)]).astype(np.uint8)
    dev = jax.device_put(padded8)
    probe = jax.jit(lambda a: jnp.sum(a[:1, :8].astype(jnp.int32)))
    packed, nbands = _encode_front_q(dev, 8, SB, SB, qp, bands_l)
    float(probe(packed))
    t1 = time.perf_counter()
    tiny = float(probe(dev))          # RTT baseline
    rtt = time.perf_counter() - t1
    t0 = time.perf_counter()
    for _ in range(reps):
        pk2, _ = _encode_front_q(dev, 8, SB, SB, qp, bands_l)
        float(probe(pk2))
    front = emit("front_device_compute",
                 max((time.perf_counter() - t0) / reps - rtt, 0) * 1e3,
                 rtt_ms=round(rtt * 1e3, 2))

    # host EC over prefetched data
    buf = np.asarray(packed)
    nb = buf.shape[0]
    dc = buf[:, :4].copy().view(np.int32).reshape(nb)
    sums = buf[:, 4:4 + nbands * 12].copy().view(np.int32) \
        .reshape(nb, nbands, 3).astype(np.int64)
    pulses = buf[:, 4 + nbands * 12:].view(np.int8)
    igain = (sums[..., 0] << 18) + (sums[..., 1] << 10) + sums[..., 2]
    fr = (np.ascontiguousarray(dc, dtype=np.int64),
          icbrt_array(igain), np.ascontiguousarray(pulses),
          int(igain.shape[1]), nb // 3)
    import ctypes
    lib = enc.lib
    t0 = time.perf_counter()
    for _ in range(reps):
        bands = np.asarray(bands_l, np.int32)
        hq = lib.ffv2rt_enc_create(
            qp, bands.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(bands))
        enc._code_stage_into(hq, fr)
        out = np.empty(1 << 22, np.uint8)
        lib.ffv2rt_enc_done.restype = ctypes.c_int64
        lib.ffv2rt_enc_done(hq, out.ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)), 1 << 22)
        lib.ffv2rt_enc_destroy(hq)
    ec = emit("ec_host", (time.perf_counter() - t0) / reps * 1e3)

    transfers = max(e2e - ec - front, 0)
    mb = (padded8.nbytes + buf.nbytes) / 1e6
    emit("transfers_derived", transfers, mb=round(mb, 3),
         tunnel_mb_s=round(mb / max(transfers, 1e-6) * 1e3, 2))
    comp = front + ec
    print(json.dumps({
        "e2e_mpix_s": round(pix / e2e * 1e3, 3),
        "transfer_share": round(transfers / e2e, 3),
        "ceiling_note": (
            "e2e is tunnel-pinned on this dev rig: "
            f"{mb:.2f} MB/frame of transfers take {transfers:.0f} ms "
            f"(~{mb / max(transfers, 1e-6) * 1e3:.1f} MB/s link); with "
            "overlapped EC (PipelinedFFV2Encoder) the floor is the "
            "transfer time itself. On production TPU hosts (PCIe, "
            ">10 GB/s) the same path is compute-bound at "
            f"~{pix / max(comp, 1e-6) * 1e3:.1f} Mpix/s per "
            "(core + chip).")}))


if __name__ == "__main__":
    main()
