"""Format-coverage parity with the reference encoder: alpha planes,
planar RGB (incl. the reference's G/B plane-swap quirk at 9..14 bpc),
gray16, RGB+alpha."""

import subprocess
import tempfile

import numpy as np
import pytest

from ffmpeg_ffv2_tpu.ffv1.params import FFV1Config, params_from_config
from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec
from ffmpeg_ffv2_tpu.ffv1 import headers as H
from ffmpeg_ffv2_tpu.container.avi import AviReader

from util import REF_FFMPEG, have_ref_ffmpeg

pytestmark = pytest.mark.skipif(not have_ref_ffmpeg(),
                                reason="reference ffmpeg not built")

W, Ht, N = 48, 32, 2


def _ref_encode(raw, pix, opts, tmpdir):
    src = f"{tmpdir}/in.raw"
    out = f"{tmpdir}/o.avi"
    open(src, "wb").write(raw)
    subprocess.run(
        [REF_FFMPEG, "-y", "-loglevel", "error", "-threads", "1",
         "-f", "rawvideo", "-pix_fmt", pix, "-s", f"{W}x{Ht}", "-i", src,
         "-c:v", "ffv1", *opts, "-flags", "+bitexact",
         "-fflags", "+bitexact", "-threads", "1", "-strict", "-2",
         "-f", "avi", out], check=True)
    avi = AviReader(open(out, "rb").read())
    return avi.video.extradata, avi.video.packets


CASES = [
    # (id, ff pix_fmt, our pix_fmt, nplanes, maxval, opts, cfg, lossless)
    ("yuva444p", "yuva444p", "yuva444p", 4, 256,
     ["-level", "3", "-slices", "4", "-coder", "range_tab"],
     FFV1Config(level=3, slices=4, coder=2)),
    ("gbrp10-swap-quirk", "gbrp10le", "gbrp10", 3, 1024,
     ["-level", "3", "-slices", "4"], FFV1Config(level=3, slices=4)),
    ("gbrp12", "gbrp12le", "gbrp12", 3, 4096,
     ["-level", "3", "-slices", "4"], FFV1Config(level=3, slices=4)),
    ("gbrap10", "gbrap10le", "gbrap10", 4, 1024,
     ["-level", "3", "-slices", "4"], FFV1Config(level=3, slices=4)),
    ("gray16", "gray16le", "gray16", 1, 65536,
     ["-level", "3", "-slices", "4"], FFV1Config(level=3, slices=4)),
    ("gbrp16", "gbrp16le", "gbrp16", 3, 65536,
     ["-level", "3", "-slices", "4"], FFV1Config(level=3, slices=4)),
]


@pytest.mark.parametrize("name,ffpix,ourpix,nplanes,maxval,opts,cfg", CASES,
                         ids=[c[0] for c in CASES])
def test_format_parity(name, ffpix, ourpix, nplanes, maxval, opts, cfg,
                       tmp_path):
    rng = np.random.RandomState(5)
    frames = [[rng.randint(0, maxval, (Ht, W)).astype(np.int64)
               for _ in range(nplanes)] for _ in range(N)]
    dt = np.uint8 if maxval <= 256 else np.dtype("<u2")
    raw = b"".join(p.astype(dt).tobytes() for f in frames for p in f)
    extradata, pkts = _ref_encode(raw, ffpix, opts, str(tmp_path))

    p = params_from_config(cfg, ourpix, W, Ht)
    assert H.write_extradata(p) == extradata, "extradata mismatch"
    enc = NativeFFV1Codec(p)
    dec = NativeFFV1Codec(p)
    for t, pkt in enumerate(pkts):
        mine = enc.encode(frames[t], t % 12 == 0)
        assert mine == pkt, f"packet {t} mismatch"
        outs = dec.decode(pkt)
        for a, b in zip(frames[t], outs):
            assert np.array_equal(a, b), f"decode mismatch frame {t}"
