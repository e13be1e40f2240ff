"""FFV2 multi-chip sharding: the SB-row-banded front (lapped halo over
ppermute) must reproduce the single-device front exactly, through to
byte-identical packets."""

import numpy as np
import pytest
import jax

from ffmpeg_ffv2_tpu.ffv2 import dsp
from ffmpeg_ffv2_tpu.parallel.ffv2 import encode_front_q_sharded
from jax.sharding import Mesh


def _mesh(ns):
    devs = jax.devices()
    if len(devs) < ns:
        pytest.skip(f"need {ns} devices")
    return Mesh(np.array(devs[:ns]), ("slice",))


@pytest.mark.parametrize("ns,P,ph,pw", [
    (8, 1, 512, 64),            # gray, one SB row per shard
    (4, 3, 512, 128),           # 444, two SB rows per shard
])
def test_sharded_front_matches_single(ns, P, ph, pw):
    from ffmpeg_ffv2_tpu.ffv2.tpu import encode_front_q
    mesh = _mesh(ns)
    rng = np.random.RandomState(5)
    planes = rng.randint(0, 256, (P, ph, pw)).astype(np.int32)
    bands = list(dsp.band_starts(dsp.SB_SIZE))
    dc0, pu0, ig0 = encode_front_q(planes, 8, 16, bands)
    dc1, pu1, ig1 = encode_front_q_sharded(planes, 8, 16, bands, mesh)
    assert np.array_equal(dc0, dc1)
    assert np.array_equal(ig0, ig1)
    assert np.array_equal(np.asarray(pu0), np.asarray(pu1))


def test_sharded_packet_byte_identical():
    """Full packets: native entropy coder fed by the sharded front ==
    plain encode; and the stream decodes."""
    from ffmpeg_ffv2_tpu.ffv2.native import NativeFFV2Encoder, \
        NativeFFV2Decoder
    mesh = _mesh(8)
    w = h = 512
    rng = np.random.RandomState(9)
    yy, xx = np.mgrid[0:h, 0:w]
    planes = [(((xx * (k + 2) + yy * (k + 3)) % 256) // 4 * 4
               + rng.randint(0, 4, (h, w))).astype(np.int32) & 0xFF
              for k in range(3)]
    from ffmpeg_ffv2_tpu.ffv2.codec import FFV2Config
    enc = NativeFFV2Encoder(w, h, "yuv444p", FFV2Config(qp=16))
    ref = enc.encode(planes)
    shard_front = lambda padded, depth, qp, bands: \
        encode_front_q_sharded(padded, depth, qp, bands, mesh)
    got = enc.encode(planes, front_q=shard_front)
    assert got == ref, f"{len(got)} vs {len(ref)} bytes"
    dec = NativeFFV2Decoder(w, h)
    outs = dec.decode(got)
    assert outs[0].shape == (h, w)
