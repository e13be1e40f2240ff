#!/usr/bin/env python3
"""Batch-size scaling probe for the all-intra device encode.

Gates encode_batch(B) byte-exactness against the native encoder, then
times the device-resident batched pipeline (frames pre-staged, one
probe fetch per batch) for each requested B.  Usage:

    python tools/bench_batch_scale.py [B ...]      # default: 4 8
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
    from bench import synth_1080p_frames
    from ffmpeg_ffv2_tpu.ffv1.params import FFV1Config, params_from_config
    from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec
    from ffmpeg_ffv2_tpu.ffv1.device_coder import DeviceFFV1Encoder

    sizes = [int(a) for a in sys.argv[1:]] or [4, 8]
    w, h = 1920, 1080
    n_frames = max(sizes) * 2
    frames = synth_1080p_frames(n_frames)
    cfg = FFV1Config(level=3, coder=1, slices=30)
    p = params_from_config(cfg, "yuv420p", w, h)
    dev = DeviceFFV1Encoder(w, h, "yuv420p", cfg, use_pallas=True)
    nat = NativeFFV1Codec(p)
    planes_dev = [[jnp.asarray(pl, jnp.int32) for pl in f] for f in frames]

    for B in sizes:
        t0 = time.perf_counter()
        pk = dev.encode_batch(frames[:B])          # gate + cap adaptation
        warm = time.perf_counter() - t0
        for t in range(B):
            ref = nat.encode(frames[t], True)
            assert pk[t] == ref, f"B={B} frame {t} mismatch"
        st = dev._batch_state(B)
        caps = (st["tiles"], st["cellrows"], dev.op_cap, st["sort"])

        def bstep(fr):
            opw, n_ops, _, szs = dev._pipeline_batch(fr, st["canon"], caps)
            by, ln, fcm = dev._code_render(opw, dev.op_cap, dev.render_cap)
            return (jnp.sum(ln) + jnp.sum(szs) + fcm
                    + jnp.sum(by[:, :128].astype(jnp.int32)),
                    jnp.max(n_ops), jnp.max(ln))

        batches = [planes_dev[i:i + B]
                   for i in range(0, n_frames - B + 1, B)]
        pr, nm, lm = bstep(batches[0])
        float(pr)
        t0 = time.perf_counter()
        outs = [bstep(bt) for bt in batches]
        tot = float(sum(pr for pr, _, _ in outs))
        dt = time.perf_counter() - t0
        assert np.isfinite(tot)
        assert all(float(nm) <= dev.op_cap for _, nm, _ in outs)
        assert all(float(lm) <= dev.render_cap for _, _, lm in outs)
        mp = len(batches) * B * w * h / dt / 1e6
        print(json.dumps({
            "metric": f"ffv1_1080p_encode_tpu_device_batched{B}",
            "value": round(mp, 3), "unit": "Mpix/s",
            "vs_baseline": round(mp / 500.0, 4),
            "first_call_s": round(warm, 1),
            "gate": "byte-exact vs native"}), flush=True)


if __name__ == "__main__":
    main()
