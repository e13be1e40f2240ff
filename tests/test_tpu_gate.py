"""On-chip byte-exactness gate (the `device` tier).

Runs the full pallas device pipeline on the real TPU and asserts the
packets are byte-identical to the host C++ encoder, for the key
bitstream variants: range + rice coders, key + inter frames, RGB/RCT,
and 2-pass custom initial states.  The model is FATE's determinism
harness (tests/fate-run.sh:184-211): one committed artifact proving
on-chip equality per round.

Run:  FFV1_TPU_TIER=1 python -m pytest tests/test_tpu_gate.py -m device -v

Uses the repo-local persistent compilation cache (.jax_cache): a cold
run compiles each geometry once (minutes); a warm run is < 5 min.
"""

import numpy as np
import pytest
import jax

from ffmpeg_ffv2_tpu.ffv1.params import FFV1Config, params_from_config
from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec
from ffmpeg_ffv2_tpu.ffv1.device_coder import DeviceFFV1Encoder

pytestmark = [pytest.mark.device]


def _require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU chip")


def synth_frames(w, h, n, rgb=False, seed=1234):
    """Deterministic 'video-like' planes: gradients + moving blocks +
    mild noise (same generator family as bench.synth_1080p_frames)."""
    rng = np.random.RandomState(seed)
    frames = []
    for t in range(n):
        def plane(ph, pw, k):
            yy, xx = np.mgrid[0:ph, 0:pw]
            base = ((xx * (2 + k) + yy * (3 + k) + 7 * t) % 256)
            base = base // 4 * 4
            bx, by_ = (13 * t + 5 * k) % max(1, pw - 32), \
                (9 * t + 3 * k) % max(1, ph - 32)
            base[by_:by_ + 32, bx:bx + 32] = (base[by_:by_ + 32,
                                                   bx:bx + 32] + 64) % 256
            return (base + rng.randint(0, 3, (ph, pw))).astype(
                np.int32) & 0xFF
        if rgb:
            frames.append([plane(h, w, k) for k in range(3)])
        else:
            frames.append([plane(h, w, 0), plane(h // 2, w // 2, 1),
                           plane(h // 2, w // 2, 2)])
    return frames


def _gate(dev, nat, frames, keyflags):
    dec = NativeFFV1Codec(nat.p)
    for t, (fr, kf) in enumerate(zip(frames, keyflags)):
        pk = dev.encode(fr, force_keyframe=kf)
        ref = nat.encode(fr, kf)
        assert pk == ref, (
            f"frame {t} kf={kf}: device {len(pk)}B != native {len(ref)}B")
        out = dec.decode(pk)
        for a, b in zip(out, fr):
            assert np.array_equal(np.asarray(a), b), "not lossless"


def test_tpu_range_1080p_key_inter():
    _require_tpu()
    w, h = 1920, 1080
    cfg = FFV1Config(level=3, coder=1, slices=30)
    p = params_from_config(cfg, "yuv420p", w, h)
    dev = DeviceFFV1Encoder(w, h, "yuv420p", cfg, use_pallas=True)
    nat = NativeFFV1Codec(p)
    _gate(dev, nat, synth_frames(w, h, 3), [True, False, False])


def test_tpu_rice_1080p_key_inter():
    _require_tpu()
    w, h = 1920, 1080
    cfg = FFV1Config(level=3, coder=0, slices=30)
    p = params_from_config(cfg, "yuv420p", w, h)
    dev = DeviceFFV1Encoder(w, h, "yuv420p", cfg, use_pallas=True)
    nat = NativeFFV1Codec(p)
    _gate(dev, nat, synth_frames(w, h, 2, seed=77), [True, False])


def test_tpu_rgb_720p():
    _require_tpu()
    w, h = 1280, 720
    cfg = FFV1Config(level=3, coder=1, slices=16)
    p = params_from_config(cfg, "bgr0", w, h)
    dev = DeviceFFV1Encoder(w, h, "bgr0", cfg, use_pallas=True)
    nat = NativeFFV1Codec(p)
    _gate(dev, nat, synth_frames(w, h, 2, rgb=True, seed=9),
          [True, False])


def test_tpu_rice_rgb_720p():
    """FATE's actual bgr0 configuration: 8-bit RGB defaults to the
    Golomb-Rice coder (ffv1enc.c:563 — coder default -1 -> rice for
    bits <= 8; FATE bgr0: tests/fate/vcodec.mak:179-180).  Device rice
    RGB: fixed 1,1 RCT at bits+1, line-interleaved g/b/r streams, one
    run-index ladder across the interleaved stream."""
    _require_tpu()
    w, h = 1280, 720
    cfg = FFV1Config(level=3, coder=0, slices=16)
    p = params_from_config(cfg, "bgr0", w, h)
    dev = DeviceFFV1Encoder(w, h, "bgr0", cfg, use_pallas=True)
    nat = NativeFFV1Codec(p)
    _gate(dev, nat, synth_frames(w, h, 2, rgb=True, seed=31),
          [True, False])


def test_tpu_twopass_1080p():
    """2-pass: device encode with the pass-2 sorted transition table +
    per-context initial states == native (same params object)."""
    _require_tpu()
    from ffmpeg_ffv2_tpu.ffv1 import twopass
    w, h = 1920, 1080
    cfg = FFV1Config(level=3, coder=1, slices=30)
    frames = synth_frames(w, h, 2, seed=4242)
    p1 = params_from_config(cfg, "yuv420p", w, h)
    enc1 = NativeFFV1Codec(p1)
    enc1.enable_stats()
    for t, fr in enumerate(frames):
        enc1.encode(fr, t == 0)
    rc, rc2, gob = twopass.collect_stats(enc1)
    txt = twopass.stats_to_text(p1, rc, rc2, gob)
    p2 = twopass.apply_pass2(params_from_config(cfg, "yuv420p", w, h),
                             txt)
    assert p2.initial_states is not None
    dev = DeviceFFV1Encoder(w, h, "yuv420p", cfg, use_pallas=True,
                            params=p2)
    nat = NativeFFV1Codec(p2)
    _gate(dev, nat, frames, [True, False])


def test_tpu_parallel_encoder_1080p():
    """The public sharded encoder (ParallelFFV1Encoder, shard_map over a
    ("data","slice") mesh) on the real chip: a 1-device mesh runs the
    same sharded program structure the multi-chip dryrun validates on
    virtual devices — packets byte-identical to the host encoder at
    1080p/30 slices, key + inter, context state carried device-resident
    between calls."""
    _require_tpu()
    from jax.sharding import Mesh
    from ffmpeg_ffv2_tpu.parallel.ffv1 import ParallelFFV1Encoder
    w, h = 1920, 1080
    cfg = FFV1Config(level=3, coder=1, slices=30)
    p = params_from_config(cfg, "yuv420p", w, h)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("data", "slice"))
    par = ParallelFFV1Encoder(w, h, "yuv420p", cfg, mesh)
    nat = NativeFFV1Codec(p)
    frames = synth_frames(w, h, 3, seed=555)
    for t, fr in enumerate(frames):
        kf = t == 0
        pks = par.encode_batch([fr], force_keyframe=kf)
        ref = nat.encode(fr, kf)
        assert pks[0] == ref, f"frame {t}: {len(pks[0])} vs {len(ref)}"
