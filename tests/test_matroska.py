"""Matroska container: self-roundtrip + interop with the reference binary.

The reference carries FFV1/FFV2 in Matroska (libavformat/matroska.c:82-83
V_FFV1/V_FFV2; FFV2 has no RIFF tag, so .mkv is its only interop
container).  FFV1 is bit-exact end to end; for FFV2 we assert syntax-level
interop (the reference decoder parses our streams and vice versa) — the
reference FFV2's own encode->decode roundtrip is broken (transform
overflows + non-inverting float dequant), so pixel equality is not a
meaningful target there.
"""

import subprocess

import numpy as np
import pytest

from ffmpeg_ffv2_tpu.container import MatroskaReader, MatroskaWriter

from util import REF_FFMPEG, have_ref_ffmpeg

W, H = 192, 128


def _frames(n=3, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    base = rng.randint(0, 256, (H, W)).astype(np.int64)
    for t in range(n):
        y = np.clip(base + rng.randint(-30, 30, (H, W)) + 5 * t, 0, 255)
        out.append([y, np.clip(y // 2 + 40, 0, 255), 255 - y])
    return out


def _smooth_frames(n=3):
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for t in range(n):
        y = ((np.sin((xx + 7 * t) / 13) + np.cos((yy + 3 * t) / 17))
             * 55 + 128).astype(np.int64)
        out.append([y, y // 2 + 40, 255 - y])
    return out


def test_mkv_self_roundtrip():
    w = MatroskaWriter(320, 240, "V_FFV1", (30, 1), extradata=b"\x01\x02")
    pkts = [b"hello" * 10, b"world" * 7, b"x" * 1]
    for i, p in enumerate(pkts):
        w.write_packet(p, keyframe=(i == 0))
    r = MatroskaReader(w.tobytes())
    t = r.video
    assert t.codec_id == "V_FFV1"
    assert (t.width, t.height) == (320, 240)
    assert t.extradata == b"\x01\x02"
    assert t.packets == pkts
    assert t.keyflags == [True, False, False]
    assert t.times_ms == [0, 33, 66]


def test_mkv_many_clusters():
    w = MatroskaWriter(16, 16, "V_FFV2", (1, 60))  # 1 fps/60 -> 60s apart
    for i in range(4):
        w.write_packet(bytes([i]) * 8)
    t = MatroskaReader(w.tobytes()).video
    assert len(t.packets) == 4
    assert t.times_ms == [0, 60000, 120000, 180000]


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
        mkv = MatroskaWriter(W, H, "V_FFV1", (25, 1),
                             extradata=Hdr.write_extradata(p))
        for i, f in enumerate(frames):
            mkv.write_packet(enc.encode(f, keyframe=(i == 0)),
                             keyframe=(i == 0))
        path = tmp_path / "ours.mkv"
        mkv.save(str(path))

        out = tmp_path / "dec.yuv"
        subprocess.run(
            [REF_FFMPEG, "-y", "-loglevel", "error", "-i", str(path),
             "-f", "rawvideo", "-pix_fmt", "yuv444p", str(out)], check=True)
        got = np.fromfile(out, dtype=np.uint8).reshape(len(frames), 3, H, W)
        for i, f in enumerate(frames):
            for p in range(3):
                assert np.array_equal(got[i, p], f[p].astype(np.uint8))

    def test_ffv1_reference_to_ours(self, tmp_path):
        from ffmpeg_ffv2_tpu.ffv1 import headers as Hdr
        from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec

        frames = _frames(seed=1)
        raw = tmp_path / "in.yuv"
        raw.write_bytes(b"".join(p.astype(np.uint8).tobytes()
                                 for f in frames for p in f))
        path = tmp_path / "ref.mkv"
        subprocess.run(
            [REF_FFMPEG, "-y", "-loglevel", "error", "-f", "rawvideo",
             "-pix_fmt", "yuv444p", "-s", f"{W}x{H}", "-i", str(raw),
             "-c:v", "ffv1", "-level", "3", "-slices", "4", str(path)],
            check=True)

        t = MatroskaReader(path.read_bytes()).video
        assert t.codec_id == "V_FFV1"
        p = Hdr.read_extradata(t.extradata, t.width, t.height)
        dec = NativeFFV1Codec(p)
        assert len(t.packets) == len(frames)
        for pkt, f in zip(t.packets, frames):
            out = dec.decode(pkt)
            for pl in range(3):
                assert np.array_equal(np.asarray(out[pl]),
                                      f[pl].astype(np.uint8))

    def test_ffv2_ours_to_reference(self, tmp_path):
        from ffmpeg_ffv2_tpu.ffv2 import FFV2Config
        from ffmpeg_ffv2_tpu.ffv2.native import NativeFFV2Encoder

        frames = _smooth_frames()
        enc = NativeFFV2Encoder(W, H, "yuv444p", FFV2Config(qp=16))
        mkv = MatroskaWriter(W, H, "V_FFV2", (25, 1))
        for f in frames:
            mkv.write_packet(enc.encode(f))
        path = tmp_path / "ours.mkv"
        mkv.save(str(path))

        out = tmp_path / "dec.yuv"
        subprocess.run(
            [REF_FFMPEG, "-y", "-loglevel", "error", "-i", str(path),
             "-f", "rawvideo", "-pix_fmt", "yuv444p", str(out)], check=True)
        got = np.fromfile(out, dtype=np.uint8)
        assert got.size == len(frames) * 3 * H * W
        got = got.reshape(len(frames), 3, H, W)
        # chroma is OSD-free (the reference decoder stamps a debug OSD
        # into 8-bit luma); the reference's float dequant tracks our
        # integer gains well enough to stay recognisable
        for i, f in enumerate(frames):
            err = np.sqrt(np.mean(
                [(got[i, p].astype(np.float64) - f[p]) ** 2
                 for p in (1, 2)]))
            psnr = 20 * np.log10(255 / max(err, 1e-9))
            assert psnr > 20.0, f"frame {i}: chroma PSNR {psnr:.2f}"

    def test_ffv2_split_tree_to_reference(self, tmp_path):
        """The reference decoder parses our XY split-tree streams
        (its own encoder never emits splits — RDO stub)."""
        from ffmpeg_ffv2_tpu.ffv2 import FFV2Config
        from ffmpeg_ffv2_tpu.ffv2.native import NativeFFV2Encoder

        frames = _smooth_frames(1)
        enc = NativeFFV2Encoder(W, H, "yuv444p",
                                FFV2Config(qp=16, block_size=16))
        mkv = MatroskaWriter(W, H, "V_FFV2", (25, 1))
        mkv.write_packet(enc.encode(frames[0]))
        path = tmp_path / "split.mkv"
        mkv.save(str(path))
        out = tmp_path / "dec.yuv"
        subprocess.run(
            [REF_FFMPEG, "-y", "-loglevel", "error", "-i", str(path),
             "-f", "rawvideo", "-pix_fmt", "yuv444p", str(out)], check=True)
        got = np.fromfile(out, dtype=np.uint8)
        assert got.size == 3 * H * W
        g = got.reshape(3, H, W)
        err = np.sqrt(np.mean(
            [(g[p].astype(np.float64) - frames[0][p]) ** 2 for p in (1, 2)]))
        assert 20 * np.log10(255 / max(err, 1e-9)) > 20.0

    def test_ffv2_reference_to_ours(self, tmp_path):
        from ffmpeg_ffv2_tpu.ffv2.native import NativeFFV2Decoder

        frames = _frames(seed=3)
        raw = tmp_path / "in.yuv"
        raw.write_bytes(b"".join(p.astype(np.uint8).tobytes()
                                 for f in frames for p in f))
        path = tmp_path / "ref.mkv"
        subprocess.run(
            [REF_FFMPEG, "-y", "-loglevel", "error", "-f", "rawvideo",
             "-pix_fmt", "yuv444p", "-s", f"{W}x{H}", "-i", str(raw),
             "-c:v", "ffv2", "-global_quality", "16", "-strict", "-2",
             str(path)], check=True)

        t = MatroskaReader(path.read_bytes()).video
        assert t.codec_id == "V_FFV2"
        assert len(t.packets) == len(frames)
        dec = NativeFFV2Decoder(t.width, t.height)
        for pkt in t.packets:
            out = dec.decode(pkt)   # full parse, no desync/exception
            assert len(out) == 3
            assert out[0].shape == (H, W)
