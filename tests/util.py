"""Shared test helpers: synthetic frames and reference-ffmpeg access."""

from __future__ import annotations

import os
import subprocess

import numpy as np

REF_FFMPEG = os.environ.get("REF_FFMPEG", "/root/repo/.refbuild/ffmpeg")


def have_ref_ffmpeg() -> bool:
    return os.path.exists(REF_FFMPEG)


def synth_yuv_frames(w: int, h: int, n: int, hs: int = 1, vs: int = 1,
                     bits: int = 8, seed: int = 7):
    """Deterministic synthetic clip: structured areas (exercises run mode)
    plus seeded noise (exercises the coder tails)."""
    rng = np.random.RandomState(seed)
    mx = (1 << bits) - 1
    cw, ch = -(-w >> hs), -(-h >> vs)
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    cyy, cxx = np.mgrid[0:ch, 0:cw]
    for t in range(n):
        y = ((xx * 3 + yy * 2 + t * 5) % (mx + 1))
        y = (y // 8 * 8)
        noise = rng.randint(0, 3, (h, w))
        y = np.clip(y + noise, 0, mx)
        u = (cxx * 2 + t * 3) % (mx + 1)
        v = (cyy * 3 + t) % (mx + 1)
        frames.append([y.astype(np.int64), u.astype(np.int64),
                       v.astype(np.int64)])
    return frames


def synth_rgb_frames(w: int, h: int, n: int, bits: int = 8, seed: int = 9):
    rng = np.random.RandomState(seed)
    mx = (1 << bits) - 1
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    for t in range(n):
        g = ((xx * 2 + yy + t * 7) % (mx + 1)) // 4 * 4
        b = ((xx + yy * 2 + t * 3) % (mx + 1)) // 4 * 4
        r = ((xx * 3 + t) % (mx + 1)) // 4 * 4
        g = np.clip(g + rng.randint(0, 2, (h, w)), 0, mx)
        frames.append([g.astype(np.int64), b.astype(np.int64),
                       r.astype(np.int64)])
    return frames


def pack_yuv_raw(frames, bits: int = 8) -> bytes:
    dt = np.uint8 if bits <= 8 else "<u2"
    return b"".join(p.astype(dt).tobytes() for f in frames for p in f)


def ref_encode_yuv(raw: bytes, w: int, h: int, pix_fmt: str, opts: list,
                   tmpdir: str):
    """Encode a raw clip with the reference ffmpeg, return (extradata, pkts)."""
    from ffmpeg_ffv2_tpu.container.avi import AviReader
    src = os.path.join(tmpdir, "in.raw")
    out = os.path.join(tmpdir, "ref.avi")
    with open(src, "wb") as f:
        f.write(raw)
    subprocess.run(
        [REF_FFMPEG, "-y", "-loglevel", "error", "-threads", "1",
         "-f", "rawvideo", "-pix_fmt", pix_fmt, "-s", f"{w}x{h}", "-i", src,
         "-c:v", "ffv1", *opts,
         "-flags", "+bitexact", "-fflags", "+bitexact",
         "-threads", "1", "-f", "avi", out],
        check=True)
    with open(out, "rb") as f:
        avi = AviReader(f.read())
    return avi.video.extradata, avi.video.packets
