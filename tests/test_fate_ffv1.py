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
from ffmpeg_ffv2_tpu.testsrc import (vsynth1_frames, vsynth3_frames,
                                      rotozoom_frames)

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
    if which == "vsynth3":
        return list(vsynth3_frames())
    raise ValueError(which)


def source_dims(which):
    return (34, 34) if which == "vsynth3" else (352, 288)


CASES = [
    ("vsynth1", "vsynth1-ffv1", FFV1Config(slices=4)),
    ("vsynth1", "vsynth1-ffv1-v0", FFV1Config()),
    ("vsynth1", "vsynth1-ffv1-v3-yuv420p", FFV1Config(level=3)),
    ("vsynth2", "vsynth2-ffv1", FFV1Config(slices=4)),
    ("vsynth2", "vsynth2-ffv1-v0", FFV1Config()),
    ("vsynth2", "vsynth2-ffv1-v3-yuv420p", FFV1Config(level=3)),
    ("vsynth3", "vsynth3-ffv1", FFV1Config(slices=4)),
    ("vsynth3", "vsynth3-ffv1-v0", FFV1Config()),
    ("vsynth3", "vsynth3-ffv1-v3-yuv420p", FFV1Config(level=3)),
]


@pytest.mark.parametrize("src,ref_name,cfg", CASES,
                         ids=[c[1] for c in CASES])
def test_fate_golden(src, ref_name, cfg):
    enc_md5, enc_size, dec_md5, _ = parse_golden(ref_name)
    frames = source_frames(src)
    w, h = source_dims(src)

    p = params_from_config(cfg, "yuv420p", w, h)
    extradata = H.write_extradata(p) if p.version > 1 else b""
    enc = NativeFFV1Codec(p)
    avi = AviWriter(w, h, "FFV1", (25, 1), extradata)
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
    ("vsynth2-ffv1-v3-yuv444p16", "yuv444p16",
     yuv420p_to_yuv444p16_neighbor, yuv444p16_to_yuv420p_neighbor),
    ("vsynth3-ffv1-v3-yuv422p10", "yuv422p10",
     yuv420p_to_yuv422p10_neighbor, yuv422p10_to_yuv420p_neighbor),
    ("vsynth3-ffv1-v3-yuv444p16", "yuv444p16",
     yuv420p_to_yuv444p16_neighbor, yuv444p16_to_yuv420p_neighbor),
]


@pytest.mark.parametrize("ref_name,pix,conv,back",
                         CONV_CASES, ids=[c[0] for c in CONV_CASES])
def test_fate_golden_converted(ref_name, pix, conv, back):
    enc_md5, enc_size, dec_md5, _psnr = parse_golden(ref_name)
    src = ref_name.split("-")[0]
    frames = source_frames(src)

    w, h = source_dims(src)
    cfg = FFV1Config(level=3)
    p = params_from_config(cfg, pix, w, h)
    enc = NativeFFV1Codec(p)
    avi = AviWriter(w, h, "FFV1", (25, 1), H.write_extradata(p))
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
    ("vsynth1-ffv1-v3-bgr0", "bgr0"),
    ("vsynth1-ffv1-v3-rgb48", "rgb48"),
    ("vsynth2-ffv1-v3-bgr0", "bgr0"),
    ("vsynth2-ffv1-v3-rgb48", "rgb48"),
    ("vsynth3-ffv1-v3-bgr0", "bgr0"),
    ("vsynth3-ffv1-v3-rgb48", "rgb48"),
]


@pytest.mark.parametrize("ref_name,ourpix", RGB_CASES,
                         ids=[c[0] for c in RGB_CASES])
def test_fate_golden_rgb(ref_name, ourpix):
    """RGB variants fully end-to-end with OUR swscale-equivalent
    conversions: yuv420p source -> RGB (table/formula models) -> FFV1 ->
    decode -> RGB -> yuv420p; all four FATE transcript values must match
    (container md5, size, decoded-raw md5, tiny_psnr line)."""
    from ffmpeg_ffv2_tpu.convert import (yuv420p_to_bgr0, yuv420p_to_rgb48,
                                         bgr0_to_yuv420p, gbrp16_to_yuv420p,
                                         unpack_bgr0, unpack_rgb48,
                                         pack_bgr0, pack_rgb48)
    from ffmpeg_ffv2_tpu.utils.psnr import tiny_psnr_line
    with open(os.path.join(VSYNTH_REF, ref_name)) as f:
        lines = f.read().strip().splitlines()
    enc_md5 = lines[0].split()[0]
    enc_size = int(lines[1].split()[0])
    dec_md5 = lines[2].split()[0]
    psnr_golden = lines[3]

    src = ref_name.split("-")[0]
    frames = source_frames(src)
    w, h = source_dims(src)

    cfg = FFV1Config(level=3)
    p = params_from_config(cfg, ourpix, w, h)
    enc = NativeFFV1Codec(p)
    avi = AviWriter(w, h, "FFV1", (25, 1), H.write_extradata(p))
    rgb_frames = []
    for t, planes in enumerate(frames):
        if ourpix == "bgr0":
            img = yuv420p_to_bgr0(*planes)
            gbr = unpack_bgr0(img.tobytes(), w, h)
        else:
            img = yuv420p_to_rgb48(*planes)
            gbr = unpack_rgb48(img.astype("<u2").tobytes(), w, h)
        rgb_frames.append(img)
        key = t % 12 == 0
        avi.write_packet(enc.encode([pl.astype(np.int32) for pl in gbr],
                                    key), key)
    data = avi.getvalue()
    assert len(data) == enc_size
    assert hashlib.md5(data).hexdigest() == enc_md5

    # decode, convert back to yuv420p, compare the FATE decode transcript
    dec = NativeFFV1Codec(p)
    raw = hashlib.md5()
    dec_raw = bytearray()
    for t, pkt in enumerate(AviReader(data).video.packets):
        outs = dec.decode(pkt)
        if ourpix == "bgr0":
            img = np.frombuffer(pack_bgr0(outs), np.uint8).reshape(h, w, 4)
            back = bgr0_to_yuv420p(img)
        else:
            # the decoder's native rgb48 output picture is planar gbrp16
            back = gbrp16_to_yuv420p(*outs)
        for pl in back:
            b = pl.astype(np.uint8).tobytes()
            raw.update(b)
            dec_raw.extend(b)
    assert raw.hexdigest() == dec_md5, "decoded raw md5 mismatch"

    src_raw = b"".join(pl.astype(np.uint8).tobytes()
                       for f in frames for pl in f)
    assert tiny_psnr_line(src_raw, bytes(dec_raw)) == psnr_golden


LENA_VARIANTS = ["", "-v0", "-v3-yuv420p", "-v3-yuv422p10", "-v3-yuv444p16",
                 "-v3-bgr0", "-v3-rgb48"]


@pytest.mark.parametrize("variant", LENA_VARIANTS,
                         ids=[f"vsynth_lena-ffv1{v}" for v in LENA_VARIANTS])
def test_fate_lena_unreproducible(variant):
    """The 7 vsynth_lena goldens need tests/lena.pnm, which the reference
    repo does not distribute (FATE downloads it separately; it is absent
    from /root/reference).  rotozoom.c falls back to reference.pnm without
    it, producing vsynth2 — so the lena transcripts cannot be regenerated
    here.  Skip explicitly rather than silently under-covering."""
    if os.path.exists(os.path.join(REF_ROOT, "tests", "lena.pnm")):
        pytest.fail("lena.pnm appeared — wire up the vsynth_lena goldens")
    pytest.skip("asset missing: tests/lena.pnm is not distributed with the "
                "reference; vsynth_lena-ffv1%s cannot be reproduced" % variant)
