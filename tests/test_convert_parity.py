"""swscale-equivalence of the conversion layer on random images."""

import subprocess

import numpy as np
import pytest

from ffmpeg_ffv2_tpu.convert import (yuv420p_to_bgr0, yuv420p_to_rgb48,
                                     bgr0_to_yuv420p, rgb48_to_yuv420p,
                                     gbrp16_to_yuv420p,
                                     yuv420p_to_yuv422p10_neighbor,
                                     yuv420p_to_yuv444p16_neighbor)

from util import REF_FFMPEG, have_ref_ffmpeg

pytestmark = pytest.mark.skipif(not have_ref_ffmpeg(),
                                reason="reference ffmpeg not built")

W = H = 96
SWS = ["-sws_flags", "neighbor+bitexact",
       "-sws_flags", "+accurate_rnd+bitexact"]


def _ff(raw, inpix, outpix, tmp_path):
    src = tmp_path / "in.raw"
    dst = tmp_path / "out.raw"
    src.write_bytes(raw)
    subprocess.run(
        [REF_FFMPEG, "-y", "-loglevel", "error", "-f", "rawvideo",
         "-pix_fmt", inpix, "-s", f"{W}x{H}", "-i", str(src),
         "-pix_fmt", outpix, "-strict", "-2", *SWS,
         "-f", "rawvideo", str(dst)], check=True)
    return dst.read_bytes()


def _yuv(seed):
    rng = np.random.RandomState(seed)
    return (rng.randint(0, 256, (H, W)).astype(np.uint8),
            rng.randint(0, 256, (H // 2, W // 2)).astype(np.uint8),
            rng.randint(0, 256, (H // 2, W // 2)).astype(np.uint8))


def test_yuv420p_to_bgr0(tmp_path):
    y, u, v = _yuv(0)
    ref = _ff(y.tobytes() + u.tobytes() + v.tobytes(), "yuv420p", "bgr0",
              tmp_path)
    assert yuv420p_to_bgr0(y, u, v).tobytes() == ref


def test_yuv420p_to_rgb48(tmp_path):
    y, u, v = _yuv(1)
    ref = _ff(y.tobytes() + u.tobytes() + v.tobytes(), "yuv420p", "rgb48le",
              tmp_path)
    assert yuv420p_to_rgb48(y, u, v).astype("<u2").tobytes() == ref


def test_bgr0_to_yuv420p(tmp_path):
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (H, W, 4)).astype(np.uint8)
    ref = _ff(img.tobytes(), "bgr0", "yuv420p", tmp_path)
    got = b"".join(p.tobytes() for p in bgr0_to_yuv420p(img))
    assert got == ref


def test_rgb48_to_yuv420p(tmp_path):
    rng = np.random.RandomState(3)
    img = rng.randint(0, 65536, (H, W, 3)).astype("<u2")
    ref = _ff(img.tobytes(), "rgb48le", "yuv420p", tmp_path)
    got = b"".join(p.tobytes()
                   for p in rgb48_to_yuv420p(img.astype(np.int64)))
    assert got == ref


def test_gbrp16_to_yuv420p(tmp_path):
    rng = np.random.RandomState(4)
    g, b, r = (rng.randint(0, 65536, (H, W)).astype("<u2")
               for _ in range(3))
    ref = _ff(g.tobytes() + b.tobytes() + r.tobytes(), "gbrp16le",
              "yuv420p", tmp_path)
    got = b"".join(p.tobytes() for p in gbrp16_to_yuv420p(g, b, r))
    assert got == ref


def test_depth_conversions(tmp_path):
    y, u, v = _yuv(5)
    ref = _ff(y.tobytes() + u.tobytes() + v.tobytes(), "yuv420p",
              "yuv422p10le", tmp_path)
    ours = b"".join(p.astype("<u2").tobytes()
                    for p in yuv420p_to_yuv422p10_neighbor(y, u, v))
    assert ours == ref
    ref = _ff(y.tobytes() + u.tobytes() + v.tobytes(), "yuv420p",
              "yuv444p16le", tmp_path)
    ours = b"".join(p.astype("<u2").tobytes()
                    for p in yuv420p_to_yuv444p16_neighbor(y, u, v))
    assert ours == ref
