"""The C++ host runtime must produce byte-identical packets to the scalar
Python oracle and decode its own output bit-exactly."""

import numpy as np
import pytest

from ffmpeg_ffv2_tpu.ffv1 import FFV1Encoder, FFV1Config
from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec


def _planes(seed, w, h, bits=8, nchroma=2, hs=1, vs=1):
    rng = np.random.RandomState(seed)
    mx = (1 << bits) - 1
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(((xx * 3 + yy + seed) % (mx + 1)) // 8 * 8
                + rng.randint(0, 3, (h, w)), 0, mx)
    out = [y.astype(np.int64)]
    cw, ch = -(-w >> hs), -(-h >> vs)
    for _ in range(nchroma):
        out.append(rng.randint(0, mx + 1, (ch, cw)).astype(np.int64))
    return out


CASES = [
    ("v3-golomb", FFV1Config(slices=4), "yuv420p", 8),
    ("v3-range-custom", FFV1Config(slices=4, coder=2), "yuv420p", 8),
    ("v0", FFV1Config(), "yuv420p", 8),
    ("v4", FFV1Config(level=4, slices=4, coder=2), "yuv420p", 8),
    ("v3-16bit", FFV1Config(level=3, slices=4), "yuv444p16", 16),
    ("v3-ctx1", FFV1Config(slices=4, context=1, coder=2), "yuv420p", 8),
]


@pytest.mark.parametrize("name,cfg,fmt,bits", CASES,
                         ids=[c[0] for c in CASES])
def test_native_equals_oracle(name, cfg, fmt, bits):
    w, h = 64, 48
    py = FFV1Encoder(w, h, fmt, cfg)
    nat = NativeFFV1Codec(py.p)
    dec = NativeFFV1Codec(py.p)
    hs = 1 if "420" in fmt else 0
    vs = 1 if "420" in fmt else 0
    for t in range(3):
        planes = _planes(10 + t, w, h, bits, hs=hs, vs=vs)
        if bits == 16:
            rng = np.random.RandomState(t)
            planes = [rng.randint(0, 65536, (h, w)).astype(np.int64)
                      for _ in range(3)]
        key = t % py.cfg.gop_size == 0
        a = py.encode(planes)
        b = nat.encode(planes, key)
        assert a == b, f"frame {t}: native != oracle"
        outs = dec.decode(b)
        for x, y in zip(planes, outs):
            assert np.array_equal(x, y)
