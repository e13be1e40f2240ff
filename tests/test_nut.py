"""NUT container: self-roundtrip + bit-exact FFV1 interop with the
reference binary (libavformat/nutenc.c / nutdec.c)."""

import subprocess

import numpy as np
import pytest

from ffmpeg_ffv2_tpu.container.nut import NutWriter, NutReader, put_v, put_s, _Reader

from util import REF_FFMPEG, have_ref_ffmpeg

W, H = 192, 128


def _frames(n=3, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (H, W)).astype(np.int64)
    out = []
    for t in range(n):
        y = np.clip(base + rng.randint(-30, 30, (H, W)) + 5 * t, 0, 255)
        out.append([y, np.clip(y // 2 + 40, 0, 255), 255 - y])
    return out


def test_varint_coding():
    for v in (0, 1, 127, 128, 300, 1 << 20, (1 << 62) - 5):
        r = _Reader(put_v(v))
        assert r.get_v() == v
    for v in (0, 1, -1, 63, -64, 1 << 30, -(1 << 30)):
        r = _Reader(put_s(v))
        assert r.get_s() == v


def test_nut_self_roundtrip():
    w = NutWriter(320, 240, "FFV1", (30, 1), extradata=b"\x01\x42")
    pkts = [b"alpha" * 20, b"beta" * 9, b"g" * 3]
    for i, p in enumerate(pkts):
        w.write_packet(p, keyframe=(i != 1))
    t = NutReader(w.tobytes()).video
    assert t.fourcc == "FFV1"
    assert (t.width, t.height) == (320, 240)
    assert t.extradata == b"\x01\x42"
    assert t.packets == pkts
    assert t.keyflags == [True, False, True]
    assert t.pts_list == [0, 1, 2]


def test_nut_bad_magic():
    with pytest.raises(ValueError):
        NutReader(b"definitely not a nut file")


@pytest.mark.skipif(not have_ref_ffmpeg(), reason="reference ffmpeg not built")
class TestReferenceInterop:
    def test_ffv1_ours_to_reference(self, tmp_path):
        from ffmpeg_ffv2_tpu.ffv1 import headers as Hdr
        from ffmpeg_ffv2_tpu.ffv1.params import (FFV1Config,
                                                 params_from_config)
        from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec

        frames = _frames()
        cfg = FFV1Config(level=3, slices=4, slicecrc=1)
        p = params_from_config(cfg, "yuv444p", W, H)
        enc = NativeFFV1Codec(p)
        w = NutWriter(W, H, "FFV1", (25, 1), Hdr.write_extradata(p))
        for i, f in enumerate(frames):
            w.write_packet(enc.encode(f, keyframe=(i == 0)),
                           keyframe=(i == 0))
        path = tmp_path / "ours.nut"
        w.save(str(path))

        out = tmp_path / "dec.yuv"
        subprocess.run(
            [REF_FFMPEG, "-y", "-loglevel", "fatal", "-i", str(path),
             "-f", "rawvideo", "-pix_fmt", "yuv444p", str(out)], check=True)
        got = np.fromfile(out, dtype=np.uint8).reshape(len(frames), 3, H, W)
        for i, f in enumerate(frames):
            for pl in range(3):
                assert np.array_equal(got[i, pl], f[pl].astype(np.uint8))

    def test_ffv1_reference_to_ours(self, tmp_path):
        from ffmpeg_ffv2_tpu.ffv1 import headers as Hdr
        from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec

        frames = _frames(seed=1)
        raw = tmp_path / "in.yuv"
        raw.write_bytes(b"".join(p.astype(np.uint8).tobytes()
                                 for f in frames for p in f))
        path = tmp_path / "ref.nut"
        subprocess.run(
            [REF_FFMPEG, "-y", "-loglevel", "error", "-f", "rawvideo",
             "-pix_fmt", "yuv444p", "-s", f"{W}x{H}", "-i", str(raw),
             "-c:v", "ffv1", "-level", "3", "-slices", "4", str(path)],
            check=True)

        t = NutReader(path.read_bytes()).video
        assert t.fourcc == "FFV1"
        assert len(t.packets) == len(frames)
        assert t.keyflags[0] is True
        p = Hdr.read_extradata(t.extradata, t.width, t.height)
        dec = NativeFFV1Codec(p)
        for pkt, f in zip(t.packets, frames):
            out = dec.decode(pkt)
            for pl in range(3):
                assert np.array_equal(np.asarray(out[pl]),
                                      f[pl].astype(np.uint8))
