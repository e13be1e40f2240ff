#!/usr/bin/env python3
"""End-to-end demo of the public API: encode FFV1 + FFV2 into all three
containers, round-trip losslessly (FFV1), and — when the reference
ffmpeg is built at .refbuild/ffmpeg — cross-check both directions
against it.

Run from the repo root:  python examples/interop_demo.py
"""

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from ffmpeg_ffv2_tpu.container import AviWriter, AviReader, MatroskaWriter
from ffmpeg_ffv2_tpu.container.nut import NutWriter
from ffmpeg_ffv2_tpu.ffv1 import headers as H
from ffmpeg_ffv2_tpu.ffv1.params import FFV1Config, params_from_config
from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec
from ffmpeg_ffv2_tpu.ffv2 import FFV2Config
from ffmpeg_ffv2_tpu.ffv2.native import NativeFFV2Encoder, NativeFFV2Decoder

REF = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   ".refbuild", "ffmpeg")

W, H_ = 192, 128


def frames(n=3):
    yy, xx = np.mgrid[0:H_, 0:W]
    out = []
    for t in range(n):
        y = ((np.sin((xx + 7 * t) / 13) + np.cos((yy + 3 * t) / 17))
             * 55 + 128).astype(np.int64)
        out.append([y, y // 2 + 40, 255 - y])
    return out


def main():
    td = tempfile.mkdtemp(prefix="ffvdemo")
    fs = frames()

    # --- FFV1, all three containers, lossless round trip -----------------
    cfg = FFV1Config(level=3, slices=4, slicecrc=1)
    p = params_from_config(cfg, "yuv444p", W, H_)
    enc = NativeFFV1Codec(p)
    extradata = H.write_extradata(p)
    writers = {
        "avi": AviWriter(W, H_, "FFV1", (25, 1), extradata),
        "mkv": MatroskaWriter(W, H_, "V_FFV1", (25, 1), extradata),
        "nut": NutWriter(W, H_, "FFV1", (25, 1), extradata),
    }
    pkts = [enc.encode(f, keyframe=(i == 0)) for i, f in enumerate(fs)]
    for ext, wtr in writers.items():
        for i, pkt in enumerate(pkts):
            wtr.write_packet(pkt, keyframe=(i == 0))
        wtr.save(os.path.join(td, f"demo.{ext}"))

    dec = NativeFFV1Codec(p)
    st = AviReader(open(os.path.join(td, "demo.avi"), "rb").read()).video
    for i, pkt in enumerate(st.packets):
        for a, b in zip(dec.decode(pkt), fs[i]):
            assert np.array_equal(np.asarray(a), b)
    print(f"FFV1: lossless round trip OK over avi/mkv/nut ({td})")

    # --- FFV2 (native fast path), adaptive splits -------------------------
    enc2 = NativeFFV2Encoder(W, H_, "yuv444p",
                             FFV2Config(qp=16, block_size=0))
    dec2 = NativeFFV2Decoder(W, H_)
    out = dec2.decode(enc2.encode(fs[0]))
    err = np.sqrt(np.mean([(np.asarray(out[p]).astype(np.float64)
                            - fs[0][p]) ** 2 for p in range(3)]))
    print(f"FFV2: adaptive-split encode/decode OK "
          f"(PSNR {20 * np.log10(255 / err):.1f} dB @ qp16)")

    # --- reference interop -------------------------------------------------
    if not os.path.exists(REF):
        print("reference ffmpeg not built; skipping cross-checks")
        return
    for ext in ("avi", "mkv", "nut"):
        out_raw = os.path.join(td, f"ref_{ext}.yuv")
        subprocess.run([REF, "-y", "-loglevel", "fatal",
                        "-i", os.path.join(td, f"demo.{ext}"),
                        "-f", "rawvideo", out_raw], check=True)
        got = np.fromfile(out_raw, np.uint8).reshape(len(fs), 3, H_, W)
        for i, f in enumerate(fs):
            for pl in range(3):
                assert np.array_equal(got[i, pl], f[pl].astype(np.uint8))
        print(f"FFV1: reference binary decodes our .{ext} bit-exactly")


if __name__ == "__main__":
    main()
