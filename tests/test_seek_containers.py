"""Container seek indexes: Matroska Cues/SeekHead + NUT trailing INDEX,
verified by seeking with the reference binary (matroskaenc.c cue writing /
nutenc.c write_index are the counterparts)."""

import os
import subprocess

import numpy as np
import pytest

from ffmpeg_ffv2_tpu.ffv1 import FFV1Config
from ffmpeg_ffv2_tpu.ffv1.params import params_from_config
from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec
from ffmpeg_ffv2_tpu.ffv1 import headers as H
from ffmpeg_ffv2_tpu.container.matroska import MatroskaWriter, MatroskaReader
from ffmpeg_ffv2_tpu.container.nut import NutWriter, NutReader

FFMPEG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".refbuild", "ffmpeg")
needs_ref = pytest.mark.skipif(not os.path.exists(FFMPEG),
                               reason="reference ffmpeg not built")

W, H_ = 64, 48
N_FRAMES = 25
KEY_INT = 5


def _encode(tmp_path, container):
    rng = np.random.RandomState(9)
    cfg = FFV1Config(level=3, coder=1, slices=4)
    p = params_from_config(cfg, "yuv420p", W, H_)
    enc = NativeFFV1Codec(p)
    extradata = H.write_extradata(p)
    if container == "mkv":
        wr = MatroskaWriter(W, H_, "V_FFV1", (25, 1), extradata)
    else:
        wr = NutWriter(W, H_, "FFV1", (25, 1), extradata)
    frames = []
    for t in range(N_FRAMES):
        planes = [rng.randint(0, 256, (H_, W)).astype(np.int32),
                  rng.randint(0, 256, (H_ // 2, W // 2)).astype(np.int32),
                  rng.randint(0, 256, (H_ // 2, W // 2)).astype(np.int32)]
        frames.append(planes)
        key = t % KEY_INT == 0
        wr.write_packet(enc.encode(planes, key), key)
    path = str(tmp_path / f"seek.{container}")
    wr.save(path)
    return path, frames, p


def _ref_decode_from(path, seconds, n):
    out = path + ".raw"
    subprocess.run(
        [FFMPEG, "-y", "-loglevel", "error", "-threads", "1",
         "-ss", str(seconds), "-i", path, "-frames", str(n),
         "-f", "rawvideo", "-fflags", "+bitexact", out], check=True)
    raw = np.fromfile(out, np.uint8)
    fs = W * H_ * 3 // 2
    return [raw[i * fs:(i + 1) * fs] for i in range(len(raw) // fs)]


def _flat(planes):
    return np.concatenate([pl.astype(np.uint8).ravel() for pl in planes])


@needs_ref
@pytest.mark.parametrize("container", ["mkv", "nut"])
def test_reference_binary_seeks_our_index(tmp_path, container):
    """-ss via the reference demuxer must land on our indexed keyframe."""
    path, frames, p = _encode(tmp_path, container)
    # seek to 0.65 s @ 25fps: the demuxer must jump to keyframe 15
    # (0.60 s) via the index, decode forward, and emit from ~frame 16/17.
    # A wrong seek target corrupts the inter chain, so lossless output
    # from the right position proves the indexed seek.
    got = _ref_decode_from(path, 0.65, 3)
    assert len(got) >= 2
    flats = [_flat(f) for f in frames]
    start = next((t for t, fl in enumerate(flats)
                  if np.array_equal(got[0], fl)), None)
    assert start is not None, "seek output is not a lossless source frame"
    assert 15 <= start <= 17, f"seek landed at frame {start}"
    for i in range(1, len(got)):
        assert np.array_equal(got[i], flats[start + i]), f"frame {i}"


@needs_ref
@pytest.mark.parametrize("container", ["mkv", "nut"])
def test_full_decode_still_bitexact_with_index(tmp_path, container):
    """The added index structures must not disturb normal demuxing."""
    path, frames, p = _encode(tmp_path, container)
    got = _ref_decode_from(path, 0, N_FRAMES)
    assert len(got) == N_FRAMES
    for t in range(N_FRAMES):
        assert np.array_equal(got[t], _flat(frames[t])), f"frame {t}"


def test_our_reader_parses_cues(tmp_path):
    path, frames, p = _encode(tmp_path, "mkv")
    rd = MatroskaReader(open(path, "rb").read())
    assert len(rd.cues) == (N_FRAMES + KEY_INT - 1) // KEY_INT
    times = [t for t, _ in rd.cues]
    assert times == [t * 40 for t in range(0, N_FRAMES, KEY_INT)]
    tr = rd.video
    idx = rd.seek_index(tr, 650)
    assert idx == 15 and tr.keyflags[idx]


def test_our_nut_reader_skips_index(tmp_path):
    path, frames, p = _encode(tmp_path, "nut")
    rd = NutReader(open(path, "rb").read())
    assert len(rd.video.packets) == N_FRAMES
