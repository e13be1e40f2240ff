"""Unit tests for the entropy-coder primitives (range coder, golomb, CRC)."""

import numpy as np
import pytest

from ffmpeg_ffv2_tpu.coder.rac import (RangeEncoder, RangeDecoder,
                                       build_rac_states)
from ffmpeg_ffv2_tpu.coder.symbols import put_symbol, get_symbol, new_states
from ffmpeg_ffv2_tpu.coder.bitio import BitWriter, BitReader
from ffmpeg_ffv2_tpu.coder.golomb import (VlcState, put_vlc_symbol,
                                          get_vlc_symbol, put_sr_golomb,
                                          get_sr_golomb)
from ffmpeg_ffv2_tpu.core.crc import crc32_ieee, crc32_trailer


def test_rac_state_tables():
    zero, one = build_rac_states()
    # state tables are a permutation-ish monotone map; spot invariants
    assert one[128] > 128
    assert zero[128] < 128
    for i in range(1, 255):
        if int(one[256 - i]):
            assert int(zero[i]) == 256 - int(one[256 - i])


def test_rac_bits_roundtrip():
    rng = np.random.RandomState(0)
    bits = rng.randint(0, 2, 1000).tolist()
    enc = RangeEncoder()
    st = new_states(1)[0]
    for b in bits:
        enc.put(st, 0, b)
    data = enc.terminate(1)
    dec = RangeDecoder(data)
    st = new_states(1)[0]
    out = [dec.get(st, 0) for _ in bits]
    assert out == bits


@pytest.mark.parametrize("signed", [False, True])
def test_symbols_roundtrip(signed):
    rng = np.random.RandomState(1)
    vals = rng.randint(-(2 ** 16) if signed else 0, 2 ** 16, 500).tolist()
    vals += [0, 1, -1 if signed else 2, 2 ** 20, 2 ** 24 - 1]
    enc = RangeEncoder()
    st = new_states(1)[0]
    for v in vals:
        put_symbol(enc, st, v, signed)
    data = enc.terminate(1)
    dec = RangeDecoder(data)
    st = new_states(1)[0]
    for v in vals:
        assert get_symbol(dec, st, signed) == v


def test_bitio_roundtrip():
    rng = np.random.RandomState(2)
    items = [(int(n), int(rng.randint(0, 1 << n))) for n in
             rng.randint(1, 25, 200)]
    w = BitWriter()
    for n, v in items:
        w.put(n, v)
    data = w.flush()
    r = BitReader(data)
    for n, v in items:
        assert r.get(n) == v


@pytest.mark.parametrize("k", [0, 2, 5])
def test_sr_golomb_roundtrip(k):
    vals = list(range(-40, 40)) + [100, -100, 255, -255]
    w = BitWriter()
    for v in vals:
        put_sr_golomb(w, v, k, 12, 10)
    r = BitReader(w.flush())
    for v in vals:
        assert get_sr_golomb(r, k, 12, 10) == v


def test_vlc_symbol_roundtrip():
    rng = np.random.RandomState(3)
    vals = rng.randint(-128, 128, 500).tolist()
    w = BitWriter()
    st = VlcState()
    for v in vals:
        put_vlc_symbol(w, st, v, 8)
    r = BitReader(w.flush())
    st = VlcState()
    for v in vals:
        got = get_vlc_symbol(r, st, 8)
        # put folds to `bits`; compare folded
        folded = ((v + 128) & 255) - 128
        assert got == folded


def test_crc_trailer_property():
    data = bytes(range(200)) * 3
    assert crc32_ieee(data + crc32_trailer(data)) == 0
