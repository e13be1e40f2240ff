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


# ---------------------------------------------------------------------------
# conversion variants: our swscale-equivalent conversions + our codec must
# reproduce the FATE goldens end-to-end (yuv422p10 / yuv444p16); for the
# RGB variants the YUV->RGB table conversion is reference-generated input
# (codec + container parity still golden-checked).
# ---------------------------------------------------------------------------

from ffmpeg_ffv2_tpu.convert import (yuv420p_to_yuv422p10_neighbor,
                                     yuv420p_to_yuv444p16_neighbor,
                                     yuv422p10_to_yuv420p_neighbor,
                                     yuv444p16_to_yuv420p_neighbor,
                                     unpack_bgr0, unpack_rgb48)

CONV_CASES = [
    ("vsynth1-ffv1-v3-yuv422p10", "yuv422p10",
     yuv420p_to_yuv422p10_neighbor, yuv422p10_to_yuv420p_neighbor),
    ("vsynth1-ffv1-v3-yuv444p16", "yuv444p16",
     yuv420p_to_yuv444p16_neighbor, yuv444p16_to_yuv420p_neighbor),
    ("vsynth2-ffv1-v3-yuv422p10", "yuv422p10",
     yuv420p_to_yuv422p10_neighbor, yuv422p10_to_yuv420p_neighbor),
]


@pytest.mark.parametrize("ref_name,pix,conv,back",
                         CONV_CASES, ids=[c[0] for c in CONV_CASES])
def test_fate_golden_converted(ref_name, pix, conv, back):
    enc_md5, enc_size, dec_md5, _psnr = parse_golden(ref_name)
    src = ref_name.split("-")[0]
    frames = source_frames(src)

    cfg = FFV1Config(level=3)
    p = params_from_config(cfg, pix, 352, 288)
    enc = NativeFFV1Codec(p)
    avi = AviWriter(352, 288, "FFV1", (25, 1), H.write_extradata(p))
    conv_frames = []
    for t, planes in enumerate(frames):
        cf = conv(*planes)
        conv_frames.append(cf)
        key = t % 12 == 0
        avi.write_packet(enc.encode([pl.astype(np.int32) for pl in cf], key),
                         key)
    data = avi.getvalue()
    assert len(data) == enc_size
    assert hashlib.md5(data).hexdigest() == enc_md5

    # decode + convert back to yuv420p must equal the original source
    rd = AviReader(data)
    dec = NativeFFV1Codec(p)
    raw = hashlib.md5()
    for t, pkt in enumerate(rd.video.packets):
        outs = dec.decode(pkt)
        for pl, cf in zip(outs, conv_frames[t]):
            assert np.array_equal(pl, cf), f"codec not lossless frame {t}"
        for pl in back(*outs):
            raw.update(pl.astype(np.uint8).tobytes())
    assert raw.hexdigest() == dec_md5


RGB_CASES = [
    ("vsynth1-ffv1-v3-bgr0", "bgr0", "bgr0"),
    ("vsynth1-ffv1-v3-rgb48", "rgb48le", "rgb48"),
]


@pytest.mark.parametrize("ref_name,ffpix,ourpix", RGB_CASES,
                         ids=[c[0] for c in RGB_CASES])
def test_fate_golden_rgb(ref_name, ffpix, ourpix, tmp_path):
    """RGB variants: input conversion (yuv420p -> RGB via swscale tables) is
    produced by the reference tool; coding + container must hit the FATE
    golden md5 and round-trip losslessly."""
    from util import have_ref_ffmpeg, REF_FFMPEG
    if not have_ref_ffmpeg():
        pytest.skip("reference ffmpeg needed for the RGB table conversion")
    enc_md5, enc_size, dec_md5, _ = parse_golden(ref_name)
    import subprocess
    src_yuv = tmp_path / "src.yuv"
    with open(src_yuv, "wb") as f:
        for fr in source_frames("vsynth1"):
            for pl in fr:
                f.write(pl.astype(np.uint8).tobytes())
    conv_raw = tmp_path / "conv.raw"
    subprocess.run(
        [REF_FFMPEG, "-y", "-loglevel", "error", "-f", "rawvideo",
         "-pix_fmt", "yuv420p", "-s", "352x288", "-i", str(src_yuv),
         "-pix_fmt", ffpix, "-sws_flags", "neighbor+bitexact",
         "-sws_flags", "+accurate_rnd+bitexact", "-strict", "-2",
         "-f", "rawvideo", str(conv_raw)], check=True)

    data = conv_raw.read_bytes()
    w, h = 352, 288
    if ourpix == "bgr0":
        fsz = w * h * 4
        unpack = lambda b: unpack_bgr0(b, w, h)
    else:
        fsz = w * h * 6
        unpack = lambda b: unpack_rgb48(b, w, h)
    frames = [unpack(data[i * fsz:(i + 1) * fsz])
              for i in range(len(data) // fsz)]

    cfg = FFV1Config(level=3)
    p = params_from_config(cfg, ourpix, w, h)
    enc = NativeFFV1Codec(p)
    avi = AviWriter(w, h, "FFV1", (25, 1), H.write_extradata(p))
    for t, planes in enumerate(frames):
        key = t % 12 == 0
        avi.write_packet(enc.encode([pl.astype(np.int32) for pl in planes],
                                    key), key)
    out = avi.getvalue()
    assert len(out) == enc_size
    assert hashlib.md5(out).hexdigest() == enc_md5

    dec = NativeFFV1Codec(p)
    for t, pkt in enumerate(AviReader(out).video.packets):
        outs = dec.decode(pkt)
        for pl, srcpl in zip(outs, frames[t]):
            assert np.array_equal(pl, srcpl), f"not lossless frame {t}"
