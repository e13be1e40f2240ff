"""Seek support: idx1-driven keyframe location + mid-stream decode
(the fate-seek-vsynth-ffv1 analogue)."""

import numpy as np

from ffmpeg_ffv2_tpu.ffv1.params import FFV1Config, params_from_config
from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec
from ffmpeg_ffv2_tpu.ffv1 import headers as H
from ffmpeg_ffv2_tpu.container.avi import AviWriter, AviReader


def test_seek_to_keyframe():
    w, h = 64, 48
    gop = 4
    p = params_from_config(FFV1Config(slices=4), "yuv420p", w, h)
    enc = NativeFFV1Codec(p)
    avi = AviWriter(w, h, "FFV1", (25, 1), H.write_extradata(p))
    frames = []
    rng = np.random.RandomState(0)
    for t in range(10):
        f = [rng.randint(0, 256, (h, w)).astype(np.int32),
             rng.randint(0, 256, (h // 2, w // 2)).astype(np.int32),
             rng.randint(0, 256, (h // 2, w // 2)).astype(np.int32)]
        frames.append(f)
        key = t % gop == 0
        avi.write_packet(enc.encode(f, key), key)
    data = avi.getvalue()

    rd = AviReader(data)
    assert rd.video.keyflags == [t % gop == 0 for t in range(10)]

    # seek to frame 6 -> keyframe at 4, decode forward to 6
    target = 6
    start = rd.keyframe_before(target)
    assert start == 4
    dec = NativeFFV1Codec(p)
    for t in range(start, target + 1):
        outs = dec.decode(rd.video.packets[t])
    for a, b in zip(frames[target], outs):
        assert np.array_equal(a, b)

    # seeking to a keyframe itself decodes standalone
    dec2 = NativeFFV1Codec(p)
    outs = dec2.decode(rd.video.packets[8])
    for a, b in zip(frames[8], outs):
        assert np.array_equal(a, b)
