"""Fully on-device FFV1 phase-B: adaptation + arithmetic on the TPU.

Round 1 split the encoder into device phase A (context modeling) and a host
phase B (adaptive range coding); the host *adaptation planner* — resolving
which 8-bit state value codes each binary decision — was the measured
bottleneck (~119 Mops/s on one vCPU).  This module moves that planning onto
the chip.

The key observation: ``put_symbol_inline`` (ffv1enc.c:185-231) emits, per
pixel, at most one event per state slot when the exponent e <= 9 (always
true for bits <= 10: |diff| <= 2^(bits-1)).  So the adaptive state table
walk decomposes into independent *chains*, one per (slice, plane-class,
context) "group" x 32 slots, and a group's 32 slot-chains advance together
pixel-by-pixel.  Pipeline:

1. phase A (ffv1/tpu.py) -> per-slice streams of (ctx, diff) in coding
   order (planes concatenated, ffv1enc.c:1045-1102 order).
2. group pixels by chain row = (slice, plane-class, ctx): one stable sort.
3. lay groups out as *lanes*: one group per lane, lanes sorted by length
   (descending) and packed 128 per tile; groups longer than GCAP split
   into sub-lanes placed in consecutive tiles (the TPU grid runs tiles
   sequentially, so an HBM carry buffer hands the 32 slot states from a
   sub-lane to its successor).
4. the adapt kernel walks each lane's pixels with the 32 slot states as
   sublanes; the state transition is one lanewise dynamic gather from the
   zero/one tables packed into 128 int32 words (rangecoder.h:104-121
   semantics).  It emits the pre-update state value per (pixel, slot).
5. un-permute state values to stream order (one more payload sort),
   re-index slots to emission order, compact to per-slice (sv, bit) op
   streams, and run the existing lane-parallel arithmetic coder
   (tpu_coder / pallas_coder) plus packet assembly.

The slice headers and keyframe bit are planned on the host (tiny, ~40
symbols/slice) with a recording RangeEncoder and prepended to each slice's
op stream; the tail appends the version-1 terminator op (state 129, bit 0;
rangecoder.c:109-123) and the two flush steps.

Byte-exactness oracle: the native planner (ffv1rt_plan) emits the exact
per-slice (sv, bit) streams; tests diff every stage against it and the
assembled packets against NativeFFV1Codec.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..coder.rac import (RangeEncoder, DEFAULT_ZERO_STATE, DEFAULT_ONE_STATE)
from ..core.crc import crc32_trailer
from .params import FFV1Params, FFV1Config, params_from_config, \
    CODER_RANGE_CUSTOM, CODER_GOLOMB
from .codec_py import SliceState
from . import headers as H

# ---------------------------------------------------------------------------
# transition tables
# ---------------------------------------------------------------------------


def transition_tables(p: FFV1Params) -> tuple[np.ndarray, np.ndarray]:
    """(zero_state, one_state) uint8[256] used by this stream's slices."""
    if p.ac == CODER_RANGE_CUSTOM:
        one = np.asarray(p.state_transition, dtype=np.uint8).copy()
        zero = np.zeros(256, dtype=np.uint8)
        idx = np.arange(1, 256)
        zero[256 - idx] = (256 - one[idx].astype(np.int64)).astype(np.uint8)
        return zero, one
    return (np.asarray(DEFAULT_ZERO_STATE, dtype=np.uint8),
            np.asarray(DEFAULT_ONE_STATE, dtype=np.uint8))


def packed_transition_table(p: FFV1Params) -> np.ndarray:
    """zero_state ++ one_state packed little-endian into 128 int32 words.

    Lookup of T[bit*256 + s] becomes one lanewise gather of word
    (bit*256+s)>>2 plus a byte extract — the whole table fits one
    128-lane vector register."""
    zero, one = transition_tables(p)
    return np.concatenate([zero, one]).view("<u4").astype(np.int32)


def lookup_packed(table: jnp.ndarray, idx9: jnp.ndarray) -> jnp.ndarray:
    """table: (...,128) int32 (broadcast to idx9's shape row-wise);
    idx9: int32 in [0, 512) -> table byte value (int32)."""
    word = jnp.take_along_axis(table, idx9 >> 2, axis=-1)
    return (word >> ((idx9 & 3) * 8)) & 0xFF


# ---------------------------------------------------------------------------
# put_symbol expansion (bits <= 10, so e <= 9: no slot repeats per pixel)
# ---------------------------------------------------------------------------


def k_max_for_bits(bits: int) -> int:
    """Worst-case rac ops per pixel: 2*e_max + 3, e_max = bits-1 <= 9."""
    if bits > 10:
        raise ValueError("slot-grid expansion needs e <= 9 (bits <= 10)")
    return 2 * (bits - 1) + 3


def exponent(a):
    """floor(log2(a)) for 1 <= a < 2^24 via the f32 exponent; -1 for 0."""
    f = a.astype(jnp.float32)
    e = (jax.lax.bitcast_convert_type(f, jnp.int32) >> 23) - 127
    return jnp.where(a > 0, e, -1)


def event_count(diff):
    """Number of rac ops put_symbol(diff, signed) performs."""
    e = exponent(jnp.abs(diff))
    return jnp.where(diff == 0, 1, 2 * e + 3)


def slot_bit_grid(diff):
    """Per (pixel, slot) validity and coded bit for all 32 state slots.

    diff: int32 [...]; returns (valid bool [..., 32], bit int32 [..., 32])
    following put_symbol_inline (ffv1enc.c:203-230):
      slot 0: always, bit = (v == 0)
      slots 1..e: exponent ones; slot e+1: terminator zero
      slots 22..22+e-1: mantissa bit i = slot-22 (value (a>>i)&1)
      slot 11+e: sign (v < 0)
    """
    v = diff[..., None]
    a = jnp.abs(v)
    e = exponent(jnp.abs(diff))[..., None]
    s = jnp.arange(32, dtype=jnp.int32)
    s = jnp.broadcast_to(s, v.shape[:-1] + (32,))
    nz = v != 0
    is0 = s == 0
    isexp = (s >= 1) & (s <= e + 1)
    ismant = (s >= 22) & (s <= 22 + e - 1)
    issign = s == 11 + e
    valid = is0 | (nz & (isexp | ismant | issign))
    bit = jnp.where(is0, (v == 0).astype(jnp.int32),
          jnp.where(isexp, (s <= e).astype(jnp.int32),
          jnp.where(ismant, (a >> jnp.maximum(s - 22, 0)) & 1,
                    (v < 0).astype(jnp.int32))))
    return valid, bit.astype(jnp.int32)


def emission_slots(diff, k_max: int):
    """Per (pixel, k) the state slot and coded bit in *emission order*:
    [slot0][exp 1..e asc][term e+1][mantissa desc 22+e-1..22][sign 11+e].

    Returns (slot int32 [..., K], bit int32 [..., K], valid bool [..., K]).
    """
    v = diff[..., None]
    a = jnp.abs(v)
    e = exponent(jnp.abs(diff))[..., None]
    k = jnp.arange(k_max, dtype=jnp.int32)
    k = jnp.broadcast_to(k, v.shape[:-1] + (k_max,))
    nz = v != 0
    valid = jnp.where(nz, k <= 2 * e + 2, k == 0)
    mant_i = 2 * e + 1 - k                    # for the mantissa span
    slot = jnp.where(k == 0, 0,
           jnp.where(k <= e, k,
           jnp.where(k == e + 1, e + 1,
           jnp.where(k <= 2 * e + 1, 22 + mant_i, 11 + e))))
    bit = jnp.where(k == 0, (v == 0).astype(jnp.int32),
          jnp.where(k <= e, 1,
          jnp.where(k == e + 1, 0,
          jnp.where(k <= 2 * e + 1, (a >> jnp.maximum(mant_i, 0)) & 1,
                    (v < 0).astype(jnp.int32)))))
    return (jnp.where(valid, slot, 0).astype(jnp.int32),
            jnp.where(valid, bit, 0), valid)


# ---------------------------------------------------------------------------
# host-side planning: slice header / keyframe / terminator ops
# ---------------------------------------------------------------------------


class RecordingRangeEncoder(RangeEncoder):
    """RangeEncoder that logs the (state value, bit) of every put()."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.ops_sv = []
        self.ops_bit = []

    def put(self, states, idx, bit):
        self.ops_sv.append(int(states[idx]))
        self.ops_bit.append(1 if bit else 0)
        super().put(states, idx, bit)


def plan_slice_prefix(p: FFV1Params, ss: SliceState, si: int, rect,
                      keyframe: bool) -> tuple[np.ndarray, np.ndarray]:
    """(sv, bit) ops preceding the plane data in slice si's rac stream:
    the keyframe bit for slice 0 (ffv1enc.c:1203-1211) and the slice
    header (encode_slice_header, ffv1enc.c:930-961)."""
    c = RecordingRangeEncoder()
    if p.ac == CODER_RANGE_CUSTOM:
        c.set_state_tables(p.state_transition)
    if si == 0:
        key_state = np.array([128], dtype=np.uint8)
        c.put(key_state, 0, 1 if keyframe else 0)
    if p.version > 2:
        H.write_slice_header(c, p, ss, rect)
    return (np.array(c.ops_sv, dtype=np.uint8),
            np.array(c.ops_bit, dtype=np.uint8))


TERMINATOR_SV = 129      # ff_rac_terminate version-1 bit (rangecoder.c:109)


# ---------------------------------------------------------------------------
# scalar oracle (numpy): exact chain walk, for tests
# ---------------------------------------------------------------------------


def oracle_plane_ops(p: FFV1Params, ctx_stream: np.ndarray,
                     pclass_stream: np.ndarray, diff_stream: np.ndarray,
                     states: list[np.ndarray]):
    """Walk one slice's plane data exactly like encode_plane ->
    put_symbol_inline, mutating `states` (per plane-class uint8[ctx][32]).
    Returns (sv uint8[N], bit uint8[N]) in stream order."""
    zero, one = transition_tables(p)
    svs, bits = [], []

    def put(st, slot, b):
        svs.append(st[slot])
        st[slot] = one[st[slot]] if b else zero[st[slot]]
        bits.append(b)

    for ctx, pc, v in zip(ctx_stream, pclass_stream, diff_stream):
        st = states[pc][ctx]
        if v:
            a = abs(int(v))
            e = a.bit_length() - 1
            put(st, 0, 0)
            for i in range(e):
                put(st, 1 + i, 1)
            put(st, 1 + e, 0)
            for i in range(e - 1, -1, -1):
                put(st, 22 + i, (a >> i) & 1)
            put(st, 11 + e, 1 if v < 0 else 0)
        else:
            put(st, 0, 1)
    return np.array(svs, dtype=np.uint8), np.array(bits, dtype=np.uint8)
