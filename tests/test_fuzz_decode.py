"""Decoder hardening: random corruptions and truncations must never crash
(the tools/target_dec_fuzzer.c analogue); CRC-protected streams must flag
damage and conceal."""

import numpy as np
import pytest

from ffmpeg_ffv2_tpu.ffv1.params import FFV1Config, params_from_config
from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec
from ffmpeg_ffv2_tpu.ffv2 import FFV2Decoder


def _packets():
    w, h = 64, 48
    p = params_from_config(FFV1Config(slices=4, coder=2), "yuv420p", w, h)
    enc = NativeFFV1Codec(p)
    rng = np.random.RandomState(0)
    pkts = []
    for t in range(3):
        f = [rng.randint(0, 256, (h, w)).astype(np.int32),
             rng.randint(0, 256, (h // 2, w // 2)).astype(np.int32),
             rng.randint(0, 256, (h // 2, w // 2)).astype(np.int32)]
        pkts.append(enc.encode(f, t == 0))
    return p, pkts


def test_ffv1_corruption_fuzz():
    p, pkts = _packets()
    rng = np.random.RandomState(7)
    for trial in range(60):
        dec = NativeFFV1Codec(p)
        dec.decode(pkts[0])
        pkt = bytearray(pkts[1])
        n_flips = rng.randint(1, 8)
        for _ in range(n_flips):
            pkt[rng.randint(0, len(pkt))] ^= 1 << rng.randint(0, 8)
        try:
            dec.decode(bytes(pkt))  # damaged slices conceal; no crash
        except ValueError:
            pass  # slice-chain breakage is a clean error


def test_ffv1_truncation_fuzz():
    p, pkts = _packets()
    for cut in (0, 1, 2, 5, 17, 100, len(pkts[0]) - 1):
        dec = NativeFFV1Codec(p)
        try:
            dec.decode(pkts[0][:cut])
        except (ValueError, RuntimeError):
            pass


def test_ffv2_garbage_fuzz():
    rng = np.random.RandomState(3)
    for _ in range(20):
        blob = rng.bytes(rng.randint(1, 400))
        try:
            FFV2Decoder(64, 64).decode(blob)
        except (ValueError, NotImplementedError, IndexError):
            pass
