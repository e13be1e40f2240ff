#!/usr/bin/env python3
"""Benchmark: 1080p FFV1 lossless encode throughput (bit-exact).

Pipeline under test: the hybrid TPU encoder — phase A (context modeling)
as jitted XLA on the TPU, phase B (adaptive range/VLC coding) in the
slice-threaded C++ host runtime.  Prints one JSON line:
    {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N}
Baseline: 500 Mpix/s/chip (BASELINE.md north star).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def synth_1080p_frames(n):
    """Deterministic, moderately compressible 1080p yuv420p frames."""
    h, w = 1080, 1920
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 2) % 256 // 8 * 8).astype(np.int32)
    cyy, cxx = np.mgrid[0:h // 2, 0:w // 2]
    cb = ((cxx + cyy) % 256).astype(np.int32)
    rng = np.random.RandomState(0)
    noise = rng.randint(0, 4, (h, w)).astype(np.int32)
    frames = []
    for t in range(n):
        y = (base + t * 5 + noise) & 0xFF
        u = (cb + t * 3) & 0xFF
        v = (cb * 2 + t) & 0xFF
        frames.append([y, u, v])
    return frames


def main():
    from ffmpeg_ffv2_tpu.ffv1.params import FFV1Config
    from ffmpeg_ffv2_tpu.ffv1.tpu_encoder import TPUFFV1Encoder
    from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec

    w, h = 1920, 1080
    n_frames = int(os.environ.get("BENCH_FRAMES", "16"))
    cfg = FFV1Config(slices=30)

    enc = TPUFFV1Encoder(w, h, "yuv420p", cfg)
    frames = synth_1080p_frames(n_frames)

    # correctness gate: first packet must decode bit-exactly
    dec = NativeFFV1Codec(enc.p)
    pkt0 = enc.encode(frames[0], force_keyframe=True)
    outs = dec.decode(pkt0)
    for a, b in zip(frames[0], outs):
        assert np.array_equal(a, b), "bench pipeline is not lossless!"

    # warmup (compile)
    enc.encode(frames[0], force_keyframe=True)

    t0 = time.perf_counter()
    total = 0
    for t in range(n_frames):
        enc.encode(frames[t])
        total += w * h
    dt = time.perf_counter() - t0

    mpix_s = total / dt / 1e6
    baseline = 500.0
    print(json.dumps({
        "metric": "ffv1_1080p_lossless_encode_throughput",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / baseline, 4),
    }))


if __name__ == "__main__":
    main()
