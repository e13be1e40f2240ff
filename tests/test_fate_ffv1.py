"""FATE golden tests: reproduce the reference's committed container md5s,
encoded sizes, and lossless round-trips on the synthetic vsynth sources.

Mirrors tests/fate/vcodec.mak + tests/fate-run.sh enc_dec for the FFV1
variants that need no pixel-format conversion.  Goldens are read from the
reference tree's tests/ref/vsynth (data, not code).
"""

import hashlib
import os

import numpy as np
import pytest

from ffmpeg_ffv2_tpu.ffv1 import FFV1Config
from ffmpeg_ffv2_tpu.ffv1.params import params_from_config
from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec
from ffmpeg_ffv2_tpu.ffv1 import headers as H
from ffmpeg_ffv2_tpu.container.avi import AviWriter, AviReader
from ffmpeg_ffv2_tpu.testsrc import vsynth1_frames, rotozoom_frames

REF_ROOT = os.environ.get("REF_ROOT", "/root/reference")
VSYNTH_REF = os.path.join(REF_ROOT, "tests", "ref", "vsynth")
REFERENCE_PNM = os.path.join(REF_ROOT, "tests", "reference.pnm")

pytestmark = pytest.mark.skipif(not os.path.isdir(VSYNTH_REF),
                                reason="reference FATE goldens not available")


def parse_golden(name):
    """(enc_md5, enc_size, dec_md5, psnr_line) from a FATE ref file."""
    with open(os.path.join(VSYNTH_REF, name)) as f:
        lines = f.read().strip().splitlines()
    enc_md5 = lines[0].split()[0]
    enc_size = int(lines[1].split()[0])
    dec_md5 = lines[2].split()[0]
    return enc_md5, enc_size, dec_md5, lines[3]


def source_frames(which):
    if which == "vsynth1":
        return list(vsynth1_frames())
    if which == "vsynth2":
        return list(rotozoom_frames(REFERENCE_PNM))
    raise ValueError(which)


CASES = [
    ("vsynth1", "vsynth1-ffv1", FFV1Config(slices=4)),
    ("vsynth1", "vsynth1-ffv1-v0", FFV1Config()),
    ("vsynth1", "vsynth1-ffv1-v3-yuv420p", FFV1Config(level=3)),
    ("vsynth2", "vsynth2-ffv1", FFV1Config(slices=4)),
    ("vsynth2", "vsynth2-ffv1-v0", FFV1Config()),
    ("vsynth2", "vsynth2-ffv1-v3-yuv420p", FFV1Config(level=3)),
]


@pytest.mark.parametrize("src,ref_name,cfg", CASES,
                         ids=[c[1] for c in CASES])
def test_fate_golden(src, ref_name, cfg):
    enc_md5, enc_size, dec_md5, _ = parse_golden(ref_name)
    frames = source_frames(src)

    p = params_from_config(cfg, "yuv420p", 352, 288)
    extradata = H.write_extradata(p) if p.version > 1 else b""
    enc = NativeFFV1Codec(p)
    avi = AviWriter(352, 288, "FFV1", (25, 1), extradata)
    for t, planes in enumerate(frames):
        key = t % 12 == 0
        pkt = enc.encode([pl.astype(np.int32) for pl in planes], key)
        avi.write_packet(pkt, key)
    data = avi.getvalue()

    assert len(data) == enc_size, "encoded size mismatch"
    assert hashlib.md5(data).hexdigest() == enc_md5, "container md5 mismatch"

    # decode side: bit-exact lossless round-trip through our own demuxer
    rd = AviReader(data)
    dec = NativeFFV1Codec(p)
    raw = hashlib.md5()
    for t, pkt in enumerate(rd.video.packets):
        outs = dec.decode(pkt)
        for pl, srcpl in zip(outs, frames[t]):
            assert np.array_equal(pl, srcpl.astype(np.int32)), \
                f"decode mismatch frame {t}"
        for pl in outs:
            raw.update(pl.astype(np.uint8).tobytes())
    assert raw.hexdigest() == dec_md5, "decoded raw md5 mismatch"
