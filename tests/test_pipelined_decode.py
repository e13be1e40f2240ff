"""Frame-pipelined native decode (slice-column chains).

The reference overlaps consecutive frames with frame threads ordered by
per-slice progress (pthread_frame.c:473/558, ffv1dec.c context carry);
our native runtime expresses the same dependency order as slice-column
chains (Codec::decode_frames_pipelined).  These tests pin byte/pixel
equality with the sequential decoder, including concealment semantics.
"""

import numpy as np
import pytest

from ffmpeg_ffv2_tpu.ffv1.params import FFV1Config, params_from_config
from ffmpeg_ffv2_tpu.ffv1.native import NativeFFV1Codec
from ffmpeg_ffv2_tpu.ffv1.batched import BatchedFFV1Decoder


def _stream(rng, w, h, n, cfg, pix="yuv420p"):
    p = params_from_config(cfg, pix, w, h)
    enc = NativeFFV1Codec(p)
    if pix == "yuv420p":
        shapes = [(h, w), ((h + 1) // 2, (w + 1) // 2),
                  ((h + 1) // 2, (w + 1) // 2)]
    else:
        shapes = [(h, w)] * 3
    frames, pkts, keys = [], [], []
    for t in range(n):
        f = [rng.randint(0, 256, s).astype(np.int32) for s in shapes]
        k = t % 5 == 0
        frames.append(f)
        keys.append(k)
        pkts.append(enc.encode(f, k))
    return p, frames, pkts, keys


@pytest.mark.parametrize("coder,threads", [(1, 1), (1, 4), (-1, 4), (0, 2)])
def test_pipelined_decode_lossless(coder, threads):
    """Pipelined decode == original frames across key+inter chains, for
    range/custom/rice coders, single- and multi-threaded."""
    rng = np.random.RandomState(3)
    cfg = FFV1Config(level=3, coder=coder, slices=4, slicecrc=1)
    p, frames, pkts, _ = _stream(rng, 64, 48, 11, cfg)
    dec = NativeFFV1Codec(p, threads)
    outs = dec.decode_pipelined(pkts)
    assert dec.last_status == [0] * len(pkts)
    for t, (o, f) in enumerate(zip(outs, frames)):
        for a, b in zip(o, f):
            assert np.array_equal(a, b), f"frame {t}"


def test_pipelined_decode_matches_sequential_on_damage():
    """A corrupted inter-frame slice: concealment (copy the co-located
    slice from the previous output) and the post-damage drift must match
    the sequential decoder exactly — the pipeline changes scheduling,
    never semantics."""
    rng = np.random.RandomState(4)
    cfg = FFV1Config(level=3, coder=1, slices=4, slicecrc=1)
    p, frames, pkts, _ = _stream(rng, 64, 48, 8, cfg)
    bad = bytearray(pkts[3])
    bad[len(bad) // 2] ^= 0xFF          # hits one slice's payload
    pkts = pkts[:3] + [bytes(bad)] + pkts[4:]

    seq = NativeFFV1Codec(p)
    ref = [seq.decode(pk) for pk in pkts]
    pipe = NativeFFV1Codec(p, 4)
    outs = pipe.decode_pipelined(pkts)
    assert any(s != 0 for s in pipe.last_status)
    for t, (o, r) in enumerate(zip(outs, ref)):
        for a, b in zip(o, r):
            assert np.array_equal(np.asarray(a), np.asarray(b)), \
                f"frame {t} diverged from sequential decode"


def test_batched_decoder_pipeline_mode():
    """BatchedFFV1Decoder auto-selects slice-column pipelining for v>=3
    and still matches the GOP path."""
    rng = np.random.RandomState(5)
    cfg = FFV1Config(level=3, coder=1, slices=4, gop_size=5)
    p, frames, pkts, keys = _stream(rng, 64, 48, 9, cfg)
    d_pipe = BatchedFFV1Decoder(p, n_workers=3)
    assert d_pipe.mode == "pipeline"
    d_gop = BatchedFFV1Decoder(p, n_workers=3, mode="gop")
    a = d_pipe.decode_all(pkts, keys)
    b = d_gop.decode_all(pkts, keys)
    for t in range(len(pkts)):
        for x, y, f in zip(a[t], b[t], frames[t]):
            assert np.array_equal(x, y)
            assert np.array_equal(x, f)
