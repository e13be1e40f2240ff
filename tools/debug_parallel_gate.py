#!/usr/bin/env python3
"""Bisect the parallel-encoder on-chip divergence (test_tpu_parallel_
encoder_1080p): which component disagrees with the host encoder?

Modes (argv[1]):
  single    DeviceFFV1Encoder.encode (pallas, warm) on the same frames
  sharded   ParallelFFV1Encoder (1,1) mesh, use_pallas=True
  shardedx  ParallelFFV1Encoder (1,1) mesh, use_pallas=False (XLA fused
            under shard_map — isolates pallas-vs-fusion)

Each mode prints per-frame equality and, on mismatch, the diverging
slice regions (trailer walk) with first-diff offsets.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def slice_regions(pkt, version, ec):
    trailer = 3 + (5 if ec else 0)
    out, end = [], len(pkt)
    while len(out) < 1024 and trailer < end:
        sz = int.from_bytes(pkt[end - trailer:end - trailer + 3], "big")
        if sz + trailer > end:
            break
        out.append((end - sz - trailer, sz + trailer))
        end -= sz + trailer
    out.reverse()
    return out


def diff_report(a, b, p):
    if a == b:
        return "identical"
    regs = slice_regions(b, p.version, p.ec)
    msgs = []
    for si, (off, ln) in enumerate(regs):
        ra, rb = a[off:off + ln], b[off:off + ln]
        if ra != rb:
            fd = next(i for i in range(min(len(ra), len(rb)))
                      if ra[i] != rb[i])
            msgs.append(f"slice {si}: first diff at +{fd}/{ln}")
    return "; ".join(msgs) or "length/layout mismatch"


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tests"))
    from test_tpu_gate import synth_frames
    from ffmpeg_ffv2_tpu.ffv1.params import FFV1Config, params_from_config
    from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec

    mode = sys.argv[1] if len(sys.argv) > 1 else "single"
    w, h = 1920, 1080
    cfg = FFV1Config(level=3, coder=1, slices=30)
    p = params_from_config(cfg, "yuv420p", w, h)
    frames = synth_frames(w, h, 3, seed=555)
    nat = NativeFFV1Codec(p)
    refs = [nat.encode(fr, t == 0) for t, fr in enumerate(frames)]

    if mode == "single":
        from ffmpeg_ffv2_tpu.ffv1.device_coder import DeviceFFV1Encoder
        dev = DeviceFFV1Encoder(w, h, "yuv420p", cfg, use_pallas=True)
        for t, fr in enumerate(frames):
            pk = dev.encode(fr, force_keyframe=(t == 0))
            print(f"single frame {t}: {diff_report(pk, refs[t], p)}",
                  flush=True)
    else:
        from jax.sharding import Mesh
        from ffmpeg_ffv2_tpu.parallel.ffv1 import ParallelFFV1Encoder
        mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                    ("data", "slice"))
        par = ParallelFFV1Encoder(w, h, "yuv420p", cfg, mesh,
                                  use_pallas=(mode == "sharded"))
        for t, fr in enumerate(frames):
            pks = par.encode_batch([fr], force_keyframe=(t == 0))
            print(f"{mode} frame {t}: {diff_report(pks[0], refs[t], p)}",
                  flush=True)


if __name__ == "__main__":
    main()
