#!/usr/bin/env python3
"""On-chip correctness gate: DeviceFFV1Encoder packets == native, quickly.

Runs the full pallas device pipeline on the real chip for a couple of
1080p frames (key + inter) and byte-compares against the host C++
encoder.  Exits non-zero on mismatch.  Usage: python tools/gate_device.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    from bench import synth_1080p_frames
    from ffmpeg_ffv2_tpu.ffv1.params import FFV1Config, params_from_config
    from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec
    from ffmpeg_ffv2_tpu.ffv1.device_coder import DeviceFFV1Encoder

    w, h = 1920, 1080
    frames = synth_1080p_frames(3)
    cfg = FFV1Config(level=3, coder=1, slices=30)
    p = params_from_config(cfg, "yuv420p", w, h)
    dev = DeviceFFV1Encoder(w, h, "yuv420p", cfg, use_pallas=True)
    nat = NativeFFV1Codec(p)
    dec = NativeFFV1Codec(p)
    for t in range(3):
        kf = t == 0
        t0 = time.perf_counter()
        pk = dev.encode(frames[t], force_keyframe=kf)
        dt = time.perf_counter() - t0
        ref = nat.encode(frames[t], kf)
        ok = pk == ref
        print(f"frame {t} kf={kf}: device {len(pk)}B ref {len(ref)}B "
              f"match={ok} ({dt:.2f}s)", flush=True)
        if not ok:
            # locate first divergence for debugging
            n = min(len(pk), len(ref))
            for i in range(n):
                if pk[i] != ref[i]:
                    print(f"  first byte mismatch at {i}/{n}")
                    break
            sys.exit(1)
        for a, b in zip(dec.decode(pk), frames[t]):
            assert np.array_equal(a, b), "not lossless"
    print("gate OK", flush=True)


if __name__ == "__main__":
    main()
