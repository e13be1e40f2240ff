"""FFV2 decoder debug OSD (ffv2dec.c:284-313,357-371 equivalent)."""

import numpy as np
import pytest

from ffmpeg_ffv2_tpu.ffv2 import osd
from ffmpeg_ffv2_tpu.ffv2.codec import FFV2Encoder, FFV2Decoder


def test_glyph_blit_matches_font():
    dst = np.zeros((16, 16), dtype=np.int64)
    osd.draw_pc_font(dst, 0, 0, ord("A"))
    glyph = osd._font()[ord("A")]
    assert np.array_equal(dst[:8, :8] == 255, glyph)
    assert np.all(dst[:8, :8][~glyph] == 0)


def test_line_layout_matches_reference():
    # char i at column (i+1)*8, lines at rows 8, 18, 28, ...
    dst = np.zeros((64, 128), dtype=np.int64)
    osd.stamp_osd(dst, 8, ["AB", "C"])
    glyph_a = osd._font()[ord("A")]
    glyph_b = osd._font()[ord("B")]
    glyph_c = osd._font()[ord("C")]
    assert np.array_equal(dst[8:16, 8:16] == 255, glyph_a)
    assert np.array_equal(dst[8:16, 16:24] == 255, glyph_b)
    assert np.array_equal(dst[18:26, 8:16] == 255, glyph_c)


def test_osd_noop_above_8bit():
    dst = np.full((32, 64), 7, dtype=np.int64)
    osd.stamp_osd(dst, 10, ["X"])
    assert np.all(dst == 7)


def test_decoder_osd_option():
    rng = np.random.RandomState(3)
    planes = [rng.randint(0, 256, (64, 64)).astype(np.int64)]
    enc = FFV2Encoder(64, 64, "gray")
    pkt = enc.encode(planes)
    plain = FFV2Decoder(64, 64).decode(pkt)
    overlaid = FFV2Decoder(64, 64, osd=True).decode(pkt)
    # overlay region differs (text drawn), rows above it identical
    assert not np.array_equal(plain[0], overlaid[0])
    assert np.array_equal(plain[0][:8], overlaid[0][:8])
    # the stamped cells are exactly {0, 255} in the first line's first char
    cell = np.asarray(overlaid[0][8:16, 8:16])
    assert set(np.unique(cell)) <= {0, 255}
