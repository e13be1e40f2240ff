"""Observability: packet slice-size walk, context occupancy, CLI -vstats.

SURVEY §5 structured per-frame stats; the trailer walk mirrors the
normative layout the reference emits (ffv1enc.c:1236-1262) and the
decoder consumes (ffv1/decoder.py), so it works on any backend's packets.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ffmpeg_ffv2_tpu.ffv1.params import FFV1Config, params_from_config
from ffmpeg_ffv2_tpu.utils.metrics import (FrameStats, context_occupancy,
                                           packet_slice_sizes)


def _frames(n, w=64, h=48):
    rng = np.random.RandomState(3)
    return [[rng.randint(0, 256, (h, w)).astype(np.int32),
             rng.randint(0, 256, (h // 2, w // 2)).astype(np.int32),
             rng.randint(0, 256, (h // 2, w // 2)).astype(np.int32)]
            for _ in range(n)]


def test_packet_slice_sizes_cover_packet():
    from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec
    cfg = FFV1Config(level=3, coder=1, slices=4, slicecrc=1)
    p = params_from_config(cfg, "yuv420p", 64, 48)
    enc = NativeFFV1Codec(p)
    pkt = enc.encode(_frames(1)[0], keyframe=True)
    regions = packet_slice_sizes(pkt, ec=True, version=p.version)
    assert len(regions) == 4
    assert sum(ln for (_, ln, _) in regions) == len(pkt)
    assert regions[0][0] == 0                      # front-to-back order
    assert all(ok for (_, _, ok) in regions)       # CRCs verify
    # corrupting a payload byte must flip exactly that slice's crc_ok
    off, ln, _ = regions[2]
    bad = bytearray(pkt)
    bad[off + 5] ^= 0xFF
    regions2 = packet_slice_sizes(bytes(bad), ec=True, version=p.version)
    assert [ok for (_, _, ok) in regions2] == [True, True, False, True]


def test_packet_slice_sizes_no_crc_and_v1():
    from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec
    cfg = FFV1Config(level=3, coder=1, slices=4, slicecrc=0)
    p = params_from_config(cfg, "yuv420p", 64, 48)
    enc = NativeFFV1Codec(p)
    pkt = enc.encode(_frames(1)[0], keyframe=True)
    regions = packet_slice_sizes(pkt, ec=False, version=p.version)
    assert sum(ln for (_, ln, _) in regions) == len(pkt)
    assert all(ok is None for (_, _, ok) in regions)
    assert packet_slice_sizes(b"xx", ec=False, version=1) == [(0, 2, None)]


def test_context_occupancy_from_twopass():
    from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec
    from ffmpeg_ffv2_tpu.ffv1.twopass import collect_stats
    cfg = FFV1Config(level=3, coder=1, slices=4)
    p = params_from_config(cfg, "yuv420p", 64, 48)
    enc = NativeFFV1Codec(p)
    enc.enable_stats()
    for f in _frames(2):
        enc.encode(f, keyframe=True)
    _, rc_stat2, _ = collect_stats(enc)
    occ = context_occupancy(rc_stat2)
    assert 0 < occ["contexts_used"] <= occ["contexts"]
    assert 0 < occ["occupancy"] <= 1
    assert occ["symbols"] > 0
    assert 0 < occ["top10pct_mass"] <= 1


def test_cli_vstats(tmp_path):
    from ffmpeg_ffv2_tpu.cli.main import main as cli_main
    w, h, n = 64, 48, 3
    raw = np.concatenate(
        [np.concatenate([pl.astype(np.uint8).ravel() for pl in f])
         for f in _frames(n)])
    src = tmp_path / "in.yuv"
    src.write_bytes(raw.tobytes())
    out = tmp_path / "out.avi"
    vs = tmp_path / "vstats.jsonl"
    cli_main(["encode", "-i", str(src), "-s", f"{w}x{h}",
              "-pix_fmt", "yuv420p", "-c", "ffv1", "-coder", "ac",
              "-slices", "4", "-level", "3", "-vstats", str(vs),
              "-o", str(out)])
    lines = [json.loads(ln) for ln in vs.read_text().splitlines()]
    assert len(lines) == n + 1
    for t, rec in enumerate(lines[:n]):
        assert rec["frame"] == t and rec["bytes"] > 0
        assert len(rec["slices"]) == 4
        assert rec["crc_ok"] in (True, False)
    summary = lines[-1]["summary"]
    assert summary["frames"] == n
    assert summary["bits_per_pixel"] > 0
    assert summary["slice_imbalance"] >= 1.0


def test_frame_stats_report():
    st = FrameStats()
    st.add_frame(100, b"x" * 50, True, [10, 20, 20])
    st.add_frame(100, b"x" * 30, False, [10, 10, 10])
    r = st.report()
    assert r["frames"] == 2 and r["keyframes"] == 1
    assert r["bytes_out"] == 80
    assert r["slice_max_bytes"] == 20
    assert r["slice_imbalance"] == 1.0
