"""FFV2 tests: Daala entropy coder (self + reference parity), DSP
invariants, transform batched==scalar exactness, codec round-trip."""

import os
import subprocess

import numpy as np
import pytest

from ffmpeg_ffv2_tpu.ffv2.entropy import DaalaEncoder, DaalaDecoder, DaalaCDF
from ffmpeg_ffv2_tpu.ffv2 import dsp
from ffmpeg_ffv2_tpu.ffv2.pvq import pvq_search, band_reconstruct, icbrt
from ffmpeg_ffv2_tpu.ffv2 import FFV2Encoder, FFV2Decoder, FFV2Config

REF_ROOT = "/root/reference"
REF_BUILD = "/root/repo/.refbuild"


def _daala_ops(seed, n_ops):
    rng = np.random.RandomState(seed)
    ops = []
    for _ in range(n_ops):
        kind = rng.randint(0, 5)
        if kind == 0:
            n = int(rng.randint(2, 200))
            ops.append(("uint", int(rng.randint(0, n)), n))
        elif kind == 1:
            nb = int(rng.randint(1, 21))
            ops.append(("bits", int(rng.randint(0, 1 << nb)), nb))
        elif kind == 2:
            ops.append(("cdf", int(rng.randint(0, 8)),
                        int(rng.randint(0, 2))))
        elif kind == 3:
            ops.append(("gol", int(rng.randint(0, 5000)), 0))
        else:
            ops.append(("bool", int(rng.randint(0, 2)),
                        int(rng.randint(1, 32768))))
    return ops


def _encode_ops(ops):
    e = DaalaEncoder()
    cdf = DaalaCDF(2, 8, 64, 0, 2, 0)
    for kind, v, x in ops:
        if kind == "uint":
            e.encode_uint(v, x)
        elif kind == "bits":
            e.encode_bits(v, x)
        elif kind == "cdf":
            e.encode_cdf_adapt(cdf, v, x, 8)
        elif kind == "gol":
            e.encode_golomb(v)
        else:
            e.encode_bool(v, x, 32768)
    return e.done()


def test_daala_ec_roundtrip():
    ops = _daala_ops(0, 2000)
    data = _encode_ops(ops)
    d = DaalaDecoder(data)
    cdf = DaalaCDF(2, 8, 64, 0, 2, 0)
    for i, (kind, v, x) in enumerate(ops):
        if kind == "uint":
            got = d.decode_uint(x)
        elif kind == "bits":
            got = d.decode_bits(x)
        elif kind == "cdf":
            got = d.decode_cdf_adapt(cdf, x, 8)
        elif kind == "gol":
            got = d.decode_golomb()
        else:
            got = d.decode_bool(x, 32768)
        assert got == v, f"op {i} ({kind})"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_BUILD, "libavcodec/libavcodec.a")),
    reason="reference libavcodec not built")
def test_daala_ec_reference_parity(tmp_path):
    """Streams from our encoder must decode identically through the
    reference C implementation (daala_entropy.c)."""
    harness_src = tmp_path / "harness.c"
    harness_src.write_text(r'''
#include <stdio.h>
#include <stdlib.h>
#include "libavcodec/daala_entropy.h"
int main(int argc, char **argv) {
    FILE *f = fopen(argv[1], "rb");
    static uint8_t buf[1 << 20];
    int n = fread(buf, 1, sizeof(buf), f);
    fclose(f);
    DaalaEntropy e;
    ff_daalaent_decode_init(&e, buf, n);
    DaalaCDF cdf;
    daalaent_cdf_alloc(&cdf, 2, 8, 64, 0, 2, 0);
    daalaent_cdf_reset(&cdf);
    FILE *sched = fopen(argv[2], "r");
    char kind[16]; long a, b;
    while (fscanf(sched, "%15s %ld %ld", kind, &a, &b) == 3) {
        long got;
        if (kind[0] == 'u') got = ff_daalaent_decode_uint(&e, b);
        else if (kind[0] == 'b' && kind[1] == 'i')
            got = ff_daalaent_decode_bits(&e, b);
        else if (kind[0] == 'c') got = ff_daalaent_decode_cdf_adapt(&e, &cdf, b, 8);
        else if (kind[0] == 'g') {
            long c2 = 1;
            while (!ff_daalaent_decode_bits(&e, 1))
                c2 = (c2 << 1) | ff_daalaent_decode_bits(&e, 1);
            got = c2 - 1;
        } else got = ff_daalaent_decode_bool(&e, b, 32768);
        printf("%ld\n", got);
    }
    return 0;
}
''')
    harness = tmp_path / "harness"
    subprocess.run(
        ["gcc", f"-I{REF_ROOT}", f"-I{REF_BUILD}", "-o", str(harness),
         str(harness_src), f"{REF_BUILD}/libavcodec/libavcodec.a",
         f"{REF_BUILD}/libavutil/libavutil.a", "-lm", "-lpthread"],
        check=True, capture_output=True)

    ops = _daala_ops(1, 3000)
    data = _encode_ops(ops)
    (tmp_path / "stream.bin").write_bytes(data)
    sched = "\n".join(f"{k} 0 {x}" for k, v, x in ops)
    (tmp_path / "sched.txt").write_text(sched)
    out = subprocess.run(
        [str(harness), str(tmp_path / "stream.bin"),
         str(tmp_path / "sched.txt")],
        check=True, capture_output=True, text=True).stdout.split()
    got = [int(x) for x in out]
    want = [v for _, v, _ in ops]
    assert got == want, "reference C decoder disagrees with our encoder"


def test_scan_order_permutation():
    for n in dsp.TX_SIZES:
        order = dsp.scan_order(n)
        assert sorted(order.tolist()) == list(range(n * n))
        # reference quirk: the true DC {0,0} is the zero-filled 16th entry
        # of the 4x4 layout, so it scans at index 15 (zigzags.h)
        assert order[15] == 0
        starts = dsp.band_starts(n)
        # ffv2_num_bands terminates with n*n: one phantom position past
        # the real AC coefficients
        assert starts[-1] == n * n
        assert all(a < b for a, b in zip(starts, starts[1:]))


def test_lap_filter_lossless_inverse():
    rng = np.random.RandomState(0)
    for size in dsp.TX_SIZES:
        x = rng.randint(-2048, 2048, (64, size)).astype(np.int64)
        assert np.array_equal(dsp.lap_postfilter(dsp.lap_prefilter(x, size),
                                                 size), x)


def test_tx_batched_matches_scalar():
    import jax
    from ffmpeg_ffv2_tpu.ffv2.tpu import fwd_tx_batch, inv_tx_batch
    rng = np.random.RandomState(0)
    for n in (4, 16, 64):
        blocks = rng.randint(-6000, 6000, (5, n, n)).astype(np.int32)
        ref = np.stack([dsp.fwd_tx_2d(b) for b in blocks])
        assert np.array_equal(ref, fwd_tx_batch(blocks))
        ref_i = np.stack([dsp.inv_tx_2d(b) for b in ref.astype(np.int32)])
        assert np.array_equal(ref_i, inv_tx_batch(ref.astype(np.int32)))


def test_pvq_properties():
    rng = np.random.RandomState(3)
    x = rng.randint(-500, 500, 64)
    for k in (1, 7, 32):
        y = pvq_search(x, k)
        assert int(np.sum(np.abs(y))) == k
        assert np.all(np.sign(y[y != 0]) == np.sign(x[y != 0]))
    rec = band_reconstruct(y, icbrt(int(np.sum(x.astype(np.int64) ** 2))))
    assert rec.shape == y.shape


def test_ffv2_codec_roundtrip():
    W, H = 128, 64
    yy, xx = np.mgrid[0:H, 0:W]
    y = ((np.sin(xx / 19) + np.cos(yy / 13)) * 70 + 128).astype(
        np.int64).clip(0, 255)
    planes = [y, (y // 2 + 30), (255 - y)]
    enc = FFV2Encoder(W, H, "yuv444p", FFV2Config(qp=24))
    pkt = enc.encode(planes)
    dec = FFV2Decoder(W, H)
    out = dec.decode(pkt)
    assert dec.fmt.name == "yuv444p"
    for a, b in zip(planes, out):
        mse = float(np.mean((a.astype(np.float64) - b) ** 2))
        psnr = 10 * np.log10(255 ** 2 / mse) if mse else 99
        assert psnr > 30, f"PSNR too low: {psnr}"


def test_ffv2_gray_and_10bit():
    W, H = 64, 64
    rng = np.random.RandomState(1)
    smooth = np.cumsum(rng.randint(-3, 4, (H, W)), axis=1) + 512
    planes = [np.clip(smooth, 0, 1023).astype(np.int64)]
    enc = FFV2Encoder(W, H, "yuv444p10", FFV2Config(qp=20))
    pkt = enc.encode([planes[0], planes[0], planes[0]])
    out = FFV2Decoder(W, H).decode(pkt)
    assert out[0].shape == (H, W)

    g8 = np.clip(smooth // 4, 0, 255).astype(np.int64)
    enc = FFV2Encoder(W, H, "gray", FFV2Config(qp=20))
    pkt = enc.encode([g8])
    out = FFV2Decoder(W, H).decode(pkt)
    assert len(out) == 1 and out[0].shape == (H, W)
