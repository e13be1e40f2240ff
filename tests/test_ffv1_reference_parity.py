"""Bit-exact parity with the reference C implementation.

Requires the reference ffmpeg binary (built out-of-tree into .refbuild/,
see README).  Packets produced by our encoder must be byte-identical to the
reference encoder's; reference packets must decode to the exact input.
"""

import numpy as np
import pytest

from ffmpeg_ffv2_tpu.ffv1 import FFV1Encoder, FFV1Decoder, FFV1Config

from util import (have_ref_ffmpeg, synth_yuv_frames, pack_yuv_raw,
                  ref_encode_yuv)

pytestmark = pytest.mark.skipif(not have_ref_ffmpeg(),
                                reason="reference ffmpeg not built")

W, H, N = 64, 48, 3

PARITY_CASES = [
    # (id, pix_fmt, hs, vs, bits, ffmpeg opts, our config)
    ("v3-golomb", "yuv420p", 1, 1, 8, ["-slices", "4"],
     FFV1Config(slices=4)),
    ("v0-golomb", "yuv420p", 1, 1, 8, ["-level", "0"],
     FFV1Config(level=0)),
    ("v3-range-custom", "yuv420p", 1, 1, 8,
     ["-slices", "4", "-coder", "range_tab"], FFV1Config(slices=4, coder=2)),
    ("v3-range-default", "yuv420p", 1, 1, 8,
     ["-slices", "4", "-coder", "range_def"], FFV1Config(slices=4, coder=-2)),
    ("v3-422p10", "yuv422p10le", 1, 0, 10,
     ["-level", "3", "-slices", "4"], FFV1Config(level=3, slices=4)),
    ("v3-444p16", "yuv444p16le", 0, 0, 16,
     ["-level", "3", "-slices", "4"], FFV1Config(level=3, slices=4)),
    ("v1-range", "yuv420p", 1, 1, 8, ["-level", "1", "-coder", "range_tab"],
     FFV1Config(level=1, coder=2)),
    ("v3-context1", "yuv420p", 1, 1, 8,
     ["-slices", "4", "-context", "1", "-coder", "range_tab"],
     FFV1Config(slices=4, context=1, coder=2)),
    ("v3-gray", "gray", 0, 0, 8, ["-slices", "4"], FFV1Config(slices=4)),
]


def test_parity_fullrange_16bit(tmp_path):
    """Full-range 16-bit exercises the int16 sample-buffer wrap semantics."""
    rng = np.random.RandomState(11)
    frames = [[rng.randint(0, 65536, (H, W)).astype(np.int64)
               for _ in range(3)] for _ in range(2)]
    raw = b"".join(p.astype("<u2").tobytes() for f in frames for p in f)
    extradata, pkts = ref_encode_yuv(raw, W, H, "yuv444p16le",
                                     ["-level", "3", "-slices", "4"],
                                     str(tmp_path))
    enc = FFV1Encoder(W, H, "yuv444p16", FFV1Config(level=3, slices=4))
    assert enc.extradata == extradata
    dec = FFV1Decoder(W, H, extradata)
    for t, pkt in enumerate(pkts):
        assert enc.encode(frames[t]) == pkt, f"frame {t}"
        out = dec.decode(pkt)
        for a, b in zip(frames[t], out):
            assert np.array_equal(a, b)


@pytest.mark.parametrize("name,pix,hs,vs,bits,opts,cfg", PARITY_CASES,
                         ids=[c[0] for c in PARITY_CASES])
def test_parity(name, pix, hs, vs, bits, opts, cfg, tmp_path):
    if pix == "gray":
        frames = [[f[0]] for f in synth_yuv_frames(W, H, N, 0, 0, bits)]
    else:
        frames = synth_yuv_frames(W, H, N, hs, vs, bits)
    raw = pack_yuv_raw(frames, bits)
    extradata, pkts = ref_encode_yuv(raw, W, H, pix, opts, str(tmp_path))

    our_fmt = {"yuv422p10le": "yuv422p10", "yuv444p16le": "yuv444p16"}.get(
        pix, pix)
    enc = FFV1Encoder(W, H, our_fmt, cfg)
    assert enc.extradata == extradata, "extradata mismatch"

    dec = FFV1Decoder(W, H, extradata)
    assert len(pkts) == N
    for t, pkt in enumerate(pkts):
        mine = enc.encode(frames[t])
        assert mine == pkt, f"packet {t} mismatch"
        out = dec.decode(pkt)
        for a, b in zip(frames[t], out):
            assert np.array_equal(a, b), f"decode mismatch frame {t}"
