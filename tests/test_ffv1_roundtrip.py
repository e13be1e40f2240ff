"""FFV1 self round-trip across versions / coders / formats."""

import numpy as np
import pytest

from ffmpeg_ffv2_tpu.ffv1 import FFV1Encoder, FFV1Decoder, FFV1Config
from ffmpeg_ffv2_tpu.core.pixfmt import get_pix_fmt


def _synth_planes(pix_fmt, w, h, seed=42):
    rng = np.random.RandomState(seed)
    fmt = get_pix_fmt(pix_fmt)
    mx = (1 << fmt.bits) - 1
    planes = []
    if fmt.colorspace == 0:
        planes.append(rng.randint(0, mx + 1, (h, w)).astype(np.int64))
        if fmt.chroma_planes:
            cw = -(-w >> fmt.chroma_h_shift)
            ch = -(-h >> fmt.chroma_v_shift)
            planes += [rng.randint(0, mx + 1, (ch, cw)).astype(np.int64)
                       for _ in range(2)]
        if fmt.transparency:
            planes.append(rng.randint(0, mx + 1, (h, w)).astype(np.int64))
    else:
        n = 3 + fmt.transparency
        planes = [rng.randint(0, mx + 1, (h, w)).astype(np.int64)
                  for _ in range(n)]
    return planes


CASES = [
    ("gray", 33, 17, FFV1Config(level=0)),
    ("yuv420p", 32, 18, FFV1Config(level=0)),
    ("yuv420p", 32, 18, FFV1Config(level=1, coder=2)),
    ("yuv420p", 32, 18, FFV1Config(level=1, coder=-2)),
    ("yuv420p", 64, 48, FFV1Config(level=3, slices=4)),
    ("yuv420p", 64, 48, FFV1Config(level=3, slices=4, coder=2)),
    ("yuv422p10", 48, 32, FFV1Config(level=3, slices=4)),
    ("yuv444p16", 48, 32, FFV1Config(level=3, slices=4)),
    ("bgr0", 40, 24, FFV1Config(level=3, slices=4)),
    ("rgb48", 40, 24, FFV1Config(level=3, slices=4)),
    ("gbrp10", 40, 24, FFV1Config(level=3, slices=4)),
    ("yuv420p", 64, 48, FFV1Config(level=3, slices=4, context=1, coder=2)),
    ("yuva444p", 32, 24, FFV1Config(level=3, slices=4, coder=2)),
]


@pytest.mark.parametrize("pix_fmt,w,h,cfg", CASES,
                         ids=[f"{c[0]}-v{max(c[3].level, 0)}-coder{c[3].coder}"
                              + ("-ctx1" if c[3].context else "")
                              for c in CASES])
def test_roundtrip(pix_fmt, w, h, cfg):
    planes = _synth_planes(pix_fmt, w, h)
    enc = FFV1Encoder(w, h, pix_fmt, cfg)
    pkt = enc.encode(planes)
    dec = FFV1Decoder(w, h, enc.extradata)
    out = dec.decode(pkt)
    for a, b in zip(planes, out):
        assert np.array_equal(a, b)


def test_multiframe_interframe_context():
    """Non-keyframes carry coder context; states must stay in sync."""
    w, h = 48, 32
    enc = FFV1Encoder(w, h, "yuv420p", FFV1Config(level=3, slices=4,
                                                  gop_size=4))
    dec = FFV1Decoder(w, h, enc.extradata)
    rng = np.random.RandomState(5)
    for t in range(6):
        planes = _synth_planes("yuv420p", w, h, seed=100 + t)
        pkt = enc.encode(planes)
        out = dec.decode(pkt)
        for a, b in zip(planes, out):
            assert np.array_equal(a, b), f"frame {t}"


def test_slicecrc_detects_corruption():
    w, h = 48, 32
    planes = _synth_planes("yuv420p", w, h)
    enc = FFV1Encoder(w, h, "yuv420p", FFV1Config(level=3, slices=4,
                                                  slicecrc=1))
    pkt0 = enc.encode(planes)
    dec = FFV1Decoder(w, h, enc.extradata)
    dec.decode(pkt0)
    # corrupt one byte inside the second frame's first slice
    planes2 = _synth_planes("yuv420p", w, h, seed=43)
    pkt = bytearray(enc.encode(planes2))
    pkt[10] ^= 0xFF
    out = dec.decode(bytes(pkt))
    assert any(ss.damaged for ss in dec.slice_states)
    # concealment copied the co-located rect from frame 0
    assert out[0].shape == (h, w)


def test_batched_gop_decode():
    """GOP-parallel decode == sequential decode, inter chains intact."""
    import numpy as np
    from ffmpeg_ffv2_tpu.ffv1.params import FFV1Config, params_from_config
    from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec
    from ffmpeg_ffv2_tpu.ffv1.batched import BatchedFFV1Decoder
    rng = np.random.RandomState(8)
    w, h = 64, 48
    cfg = FFV1Config(level=3, coder=1, slices=4, gop_size=4)
    p = params_from_config(cfg, "yuv420p", w, h)
    enc = NativeFFV1Codec(p)
    frames, pkts, keys = [], [], []
    for t in range(13):
        f = [rng.randint(0, 256, (h, w)).astype(np.int32),
             rng.randint(0, 256, (h // 2, w // 2)).astype(np.int32),
             rng.randint(0, 256, (h // 2, w // 2)).astype(np.int32)]
        k = t % 4 == 0
        frames.append(f)
        keys.append(k)
        pkts.append(enc.encode(f, k))

    dec = BatchedFFV1Decoder(p, n_workers=3)
    assert dec.split_gops(pkts, keys) == [(0, 4), (4, 8), (8, 12), (12, 13)]
    outs = dec.decode_all(pkts, keys)
    for t, (o, f) in enumerate(zip(outs, frames)):
        for a, b in zip(o, f):
            assert np.array_equal(a, b), f"frame {t}"
