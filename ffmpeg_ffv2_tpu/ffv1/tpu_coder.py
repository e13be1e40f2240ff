"""On-device FFV1 range coding — lane-parallel arithmetic over slices.

The adaptive range coder splits into:

* **adaptation** — which 8-bit state value codes each binary decision.
  That depends only on the per-(slice, context, slot) history, so the
  native planner (ffv1rt_plan) resolves it while expanding every slice's
  stream into (state_value, bit) op pairs.
* **arithmetic + byte emission** — the (low, range, pending-byte) recursion
  of the coder (rangecoder.h:71-121 semantics).  That part is identical
  lock-step work per slice, so this module runs it for ALL slices
  simultaneously: lanes = slices, one `lax.scan` step per op (ragged
  streams are padded with no-op masks).

Per step each lane's renormalization emits at most one event
(first-byte, fill-value, fill-count) into a staged [steps, lanes] buffer;
the host compacts per-lane events into the slice bytestreams and adds the
3-byte size / CRC trailers (ffv1enc.c:1236-1262 layout).  Byte-exact with
the host encoder (tests/test_tpu_coder.py).

Sharding: the lane axis is the mesh "slice" axis — each device scans its
own slice shard with zero cross-device traffic.

Golomb-Rice mode: the range-coded slice headers go through the same lane
coder; the Rice bitstream is planned natively as (value, nbits) pairs and
packed on device by ``bit_pack_lanes`` (a cumsum + disjoint-range scatter
— embarrassingly parallel, unlike the coder's carry chain).
"""

from __future__ import annotations

import ctypes
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .params import FFV1Config, params_from_config, CODER_GOLOMB
from .native import NativeFFV1Codec, get_lib
from ..core.crc import crc32_trailer
from . import headers as H

MODE_NOP = 0
MODE_OP = 1
MODE_FLUSH1 = 2   # terminate step 1: low += 0xFF; range = 0xFF; renorm
MODE_FLUSH2 = 3   # terminate step 2: range = 0xFF; renorm


@functools.partial(jax.jit, static_argnames=())
def rac_scan_lanes(sv, bit, mode):
    """Run the range-coder arithmetic for all lanes.

    sv/bit/mode: int32 [steps, lanes].  Returns staged emission arrays
    (first_byte int32 [steps, lanes] with -1 = none; fill_count int32;
    fill_val int32) — compacted on the host.
    """
    lanes = sv.shape[1]

    def step(carry, inputs):
        low, rng, pending, pcount = carry
        s, b, m = inputs
        is_op = m == MODE_OP
        is_flush1 = m == MODE_FLUSH1
        is_flush2 = m == MODE_FLUSH2
        is_flush = is_flush1 | is_flush2

        r1 = (rng * s) >> 8
        low_op = jnp.where(b != 0, low + rng - r1, low)
        rng_op = jnp.where(b != 0, r1, rng - r1)

        low1 = jnp.where(is_op, low_op,
                         jnp.where(is_flush1, low + 0xFF, low))
        rng1 = jnp.where(is_op, rng_op, jnp.where(is_flush, 0xFF, rng))

        renorm = (rng1 < 0x100) & (is_op | is_flush)
        case_b = pending < 0
        case_c = low1 <= 0xFF00
        case_d = low1 >= 0x10000

        emit = renorm & ~case_b & (case_c | case_d)
        first = jnp.where(
            emit, jnp.where(case_c, pending, pending + 1) & 0xFF, -1)
        fcount = jnp.where(emit, pcount, 0)
        fval = jnp.where(case_c, 0xFF, 0x00)

        pending2 = jnp.where(
            renorm,
            jnp.where(case_b | case_c, low1 >> 8,
                      jnp.where(case_d, (low1 >> 8) & 0xFF, pending)),
            pending)
        pcount2 = jnp.where(
            renorm,
            jnp.where(case_b | case_c | case_d, jnp.where(case_b, pcount, 0),
                      pcount + 1),
            pcount)
        low2 = jnp.where(renorm, (low1 & 0xFF) << 8, low1)
        rng2 = jnp.where(renorm, rng1 << 8, rng1)

        return (low2, rng2, pending2, pcount2), (first, fcount, fval)

    init = (jnp.zeros(lanes, jnp.int32),
            jnp.full(lanes, 0xFF00, jnp.int32),
            jnp.full(lanes, -1, jnp.int32),
            jnp.zeros(lanes, jnp.int32))
    _, staged = jax.lax.scan(step, init, (sv, bit, mode))
    return staged


@jax.jit
def bit_pack_lanes(val, nb):
    """Device bit packing for the Golomb-Rice mode: MSB-first
    concatenation of (value, nbits<=32) ops per lane.

    val/nb: uint32/int32 [steps, lanes] (nb == 0 marks padding).
    Returns (words uint32 [steps+1, lanes] big-endian bit order,
    total_bits int32 [lanes]).  Ops writing disjoint bit ranges scatter
    with add (equivalent to or).  put_bits semantics: flush pads the
    final partial byte with zero bits.
    """
    val = val.astype(jnp.uint32)
    nb32 = nb.astype(jnp.int32)
    end = jnp.cumsum(nb32, axis=0)
    start = end - nb32
    word = start >> 5
    off = start & 31
    steps, lanes = val.shape
    lo_shift = 32 - off - nb32                  # >=0 when the op fits
    fits = lo_shift >= 0
    sh1 = jnp.where(fits, jnp.minimum(lo_shift, 31),
                    -lo_shift).astype(jnp.uint32)
    c1 = jnp.where(fits, val << sh1, val >> sh1)
    sh2 = jnp.clip(64 - off - nb32, 0, 31).astype(jnp.uint32)
    c2 = jnp.where(fits, jnp.uint32(0), val << sh2)
    c1 = jnp.where(nb32 > 0, c1, 0)
    c2 = jnp.where(nb32 > 0, c2, 0)
    lane_ix = jnp.broadcast_to(jnp.arange(lanes), (steps, lanes))
    words = jnp.zeros((steps + 1, lanes), jnp.uint32)
    words = words.at[word, lane_ix].add(c1)
    words = words.at[word + 1, lane_ix].add(c2)
    return words, end[-1] if steps else jnp.zeros(lanes, jnp.int32)


def pack_lane_bytes(words_col, total_bits) -> bytes:
    """One lane's packed words -> the byte stream (big-endian words,
    length = ceil(total_bits / 8))."""
    nbytes = (int(total_bits) + 7) // 8
    return np.asarray(words_col).astype(">u4").tobytes()[:nbytes]


def compact_lane(first, fcount, fval) -> bytes:
    """Expand one lane's staged events into its bytestream."""
    out = bytearray()
    emit = first >= 0
    for i in np.nonzero(emit)[0]:
        out.append(int(first[i]))
        if fcount[i]:
            out.extend(bytes([int(fval[i])]) * int(fcount[i]))
    return bytes(out)


class TPUCoderFFV1Encoder:
    """Fully-on-device FFV1 encode pipeline for range-coder modes:
    native op planning -> lane-parallel device arithmetic -> host packet
    assembly.  Packets are byte-identical to the host encoder."""

    def __init__(self, width: int, height: int, pix_fmt: str,
                 config: FFV1Config | None = None):
        self.cfg = config or FFV1Config()
        self.p = params_from_config(self.cfg, pix_fmt, width, height)
        self.golomb = self.p.ac == CODER_GOLOMB
        self.native = NativeFFV1Codec(self.p)
        self.lib = get_lib()
        self.lib.ffv1rt_plan.restype = ctypes.c_int64
        self.lib.ffv1rt_plan.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p), ctypes.c_int]
        self.lib.ffv1rt_get_plan.restype = ctypes.c_int64
        self.lib.ffv1rt_get_plan.argtypes = [
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64]
        self.lib.ffv1rt_plan_golomb.restype = ctypes.c_int64
        self.lib.ffv1rt_plan_golomb.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p), ctypes.c_int]
        self.lib.ffv1rt_get_plan_bits.restype = ctypes.c_int64
        self.lib.ffv1rt_get_plan_bits.argtypes = [
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64]
        self.extradata = (H.write_extradata(self.p)
                          if self.p.version > 1 else b"")
        self.picture_number = 0
        self.budget_override = 0    # test hook (mirrors the native one)

    def set_budget_override(self, budget: int):
        self.budget_override = budget
        self.lib.ffv1rt_set_budget_override.argtypes = [
            ctypes.c_void_p, ctypes.c_int64]
        self.lib.ffv1rt_set_budget_override(self.native.handle, budget)

    def _plan(self, planes, keyframe):
        arrs = [np.ascontiguousarray(pl, dtype=np.int32) for pl in planes]
        ptrs = (ctypes.c_void_p * len(arrs))(
            *[a.ctypes.data_as(ctypes.c_void_p) for a in arrs])
        mx = self.lib.ffv1rt_plan(self.native.handle, ptrs,
                                  1 if keyframe else 0)
        if mx < 0:
            raise RuntimeError("op planning failed")
        n = self.p.slice_count
        svs, bits, lens = [], [], []
        for si in range(n):
            sv = np.empty(mx, dtype=np.uint8)
            bt = np.empty(mx, dtype=np.uint8)
            ln = self.lib.ffv1rt_get_plan(
                self.native.handle, si,
                sv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                bt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), mx)
            svs.append(sv)
            bits.append(bt)
            lens.append(int(ln))
        return svs, bits, lens, int(mx)

    def _encode_golomb(self, planes, keyframe) -> bytes:
        """Golomb-Rice device path: the (tiny) range-coded headers run
        through the lane coder, the Rice bitstream through the device
        bit packer; the host planner resolves the VlcState/run-ladder
        adaptation (see the ARCHITECTURE design note)."""
        arrs = [np.ascontiguousarray(pl, dtype=np.int32) for pl in planes]
        ptrs = (ctypes.c_void_p * len(arrs))(
            *[a.ctypes.data_as(ctypes.c_void_p) for a in arrs])
        mx = self.lib.ffv1rt_plan_golomb(self.native.handle, ptrs,
                                         1 if keyframe else 0)
        if mx < 0:
            raise RuntimeError("golomb op planning failed")
        n = self.p.slice_count

        hdr_sv, hdr_bit, hdr_len = [], [], []
        bit_val, bit_nb, bit_len = [], [], []
        for si in range(n):
            sv = np.empty(mx, dtype=np.uint8)
            bt = np.empty(mx, dtype=np.uint8)
            ln = self.lib.ffv1rt_get_plan(
                self.native.handle, si,
                sv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                bt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), mx)
            hdr_sv.append(sv); hdr_bit.append(bt); hdr_len.append(int(ln))
            v = np.empty(mx, dtype=np.uint32)
            nb = np.empty(mx, dtype=np.uint8)
            ln = self.lib.ffv1rt_get_plan_bits(
                self.native.handle, si,
                v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                nb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), mx)
            bit_val.append(v); bit_nb.append(nb); bit_len.append(int(ln))

        # range-coded headers through the lane coder (+terminate flush)
        hsteps = 1 << (max(hdr_len) + 2 - 1).bit_length()
        sv = np.zeros((hsteps, n), dtype=np.int32)
        bt = np.zeros((hsteps, n), dtype=np.int32)
        mode = np.zeros((hsteps, n), dtype=np.int32)
        for si in range(n):
            L = hdr_len[si]
            sv[:L, si] = hdr_sv[si][:L]
            bt[:L, si] = hdr_bit[si][:L]
            mode[:L, si] = MODE_OP
            mode[L, si] = MODE_FLUSH1
            mode[L + 1, si] = MODE_FLUSH2
        first, fcount, fval = (np.asarray(a) for a in rac_scan_lanes(
            jnp.asarray(sv), jnp.asarray(bt), jnp.asarray(mode)))

        # Rice bits through the device packer
        bsteps = 1 << max(max(bit_len), 1).bit_length()
        val = np.zeros((bsteps, n), dtype=np.uint32)
        nb = np.zeros((bsteps, n), dtype=np.int32)
        for si in range(n):
            L = bit_len[si]
            val[:L, si] = bit_val[si][:L]
            nb[:L, si] = bit_nb[si][:L]
        words, total_bits = bit_pack_lanes(jnp.asarray(val),
                                           jnp.asarray(nb))
        words = np.asarray(words)
        total_bits = np.asarray(total_bits)

        chunks = []
        for si in range(n):
            data = compact_lane(first[:, si], fcount[:, si], fval[:, si])
            data += pack_lane_bytes(words[:, si], int(total_bits[si]))
            if si > 0 or self.p.version > 2:
                assert len(data) < (1 << 24)
                data += len(data).to_bytes(3, "big")
                if self.p.ec:
                    data += b"\x00"
                    data += crc32_trailer(data)
            chunks.append(data)
        return b"".join(chunks)

    def encode(self, planes, force_keyframe=None) -> bytes:
        gop = self.cfg.gop_size
        keyframe = (gop == 0 or self.picture_number % gop == 0)
        if force_keyframe is not None:
            keyframe = bool(force_keyframe)
        if self.golomb:
            pkt = self._encode_golomb(planes, keyframe)
            self.picture_number += 1
            return pkt
        svs, bits, lens, mx = self._plan(planes, keyframe)
        n = self.p.slice_count

        # v4 PCM fallback (ffv1enc.c:1107-1117): when a slice's coded size
        # exceeds its packet region, replan it as raw-PCM ops and rerun
        # the lane coder for the retried slices
        if self.p.version > 3:
            pkt, nbytes = self._code_slices(svs, bits, lens, mx,
                                            return_nbytes=True)
            budget = (self.budget_override
                      or (16384 + self.p.width * self.p.height * 3 * 4) // n)
            over = [si for si in range(n)
                    if self._row_check_overflows(si, nbytes[:, si], budget)]
            if over:
                arrs = [np.ascontiguousarray(pl, dtype=np.int32)
                        for pl in planes]
                ptrs = (ctypes.c_void_p * len(arrs))(
                    *[a.ctypes.data_as(ctypes.c_void_p) for a in arrs])
                self.lib.ffv1rt_replan_pcm.restype = ctypes.c_int64
                self.lib.ffv1rt_replan_pcm.argtypes = [
                    ctypes.c_void_p, ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_void_p), ctypes.c_int]
                for si in over:
                    ln = self.lib.ffv1rt_replan_pcm(
                        self.native.handle, si, ptrs, 1 if keyframe else 0)
                    if ln < 0:
                        raise RuntimeError("PCM replan failed")
                    mx = max(mx, int(ln))
                    sv = np.empty(mx, dtype=np.uint8)
                    bt = np.empty(mx, dtype=np.uint8)
                    self.lib.ffv1rt_get_plan(
                        self.native.handle, si,
                        sv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        bt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        mx)
                    svs[si], bits[si], lens[si] = sv, bt, int(ln)
                pkt, nbytes = self._code_slices(svs, bits, lens, mx,
                                                return_nbytes=True)
                still = [si for si in over
                         if self._row_check_overflows(si, nbytes[:, si],
                                                      budget)]
                if still:
                    raise RuntimeError(
                        f"slices {still} overflow even as PCM")
            self.picture_number += 1
            return b"".join(self._trail(si, ch)
                            for si, ch in enumerate(pkt))

        chunks = self._code_slices(svs, bits, lens, mx)
        self.picture_number += 1
        return b"".join(self._trail(si, ch) for si, ch in enumerate(chunks))

    def _row_check_overflows(self, si, nbytes_col, budget):
        """Replay the encoder's per-row budget check
        (ffv1_runtime.cpp: obuf.size() + w*35 > budget) against the
        device coder's emitted-byte prefix at the planner's row marks."""
        self.lib.ffv1rt_get_plan_rows.restype = ctypes.c_int64
        self.lib.ffv1rt_get_plan_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64]
        cap = 4 * (self.p.height + 4)
        marks = np.empty(cap, dtype=np.int64)
        widths = np.empty(cap, dtype=np.int32)
        nrows = self.lib.ffv1rt_get_plan_rows(
            self.native.handle, si,
            marks.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
        if nrows < 0 or nrows > cap:
            raise RuntimeError("row marks unavailable")
        prefix = np.concatenate([[0], np.cumsum(nbytes_col)])
        m = marks[:nrows]
        return bool(np.any(prefix[m] + 35 * widths[:nrows].astype(np.int64)
                           > budget))

    def _code_slices(self, svs, bits, lens, mx, return_nbytes=False):
        """Run the lane coder over all slices; returns raw byte chunks.

        Lane matrices: ops + the 2-step flush tail, padded with NOPs.
        Steps round up to a power of two so the jitted scan is reused
        across frames instead of recompiling per op count."""
        n = self.p.slice_count
        steps = 1 << (mx + 2 - 1).bit_length()
        sv = np.zeros((steps, n), dtype=np.int32)
        bt = np.zeros((steps, n), dtype=np.int32)
        mode = np.zeros((steps, n), dtype=np.int32)
        for si in range(n):
            L = lens[si]
            sv[:L, si] = svs[si][:L]
            bt[:L, si] = bits[si][:L]
            mode[:L, si] = MODE_OP
            mode[L, si] = MODE_FLUSH1
            mode[L + 1, si] = MODE_FLUSH2
        first, fcount, fval = (np.asarray(a) for a in rac_scan_lanes(
            jnp.asarray(sv), jnp.asarray(bt), jnp.asarray(mode)))
        chunks = [compact_lane(first[:, si], fcount[:, si], fval[:, si])
                  for si in range(n)]
        if return_nbytes:
            return chunks, np.where(first >= 0, 1 + fcount, 0)
        return chunks

    def _trail(self, si, data):
        if si > 0 or self.p.version > 2:
            assert len(data) < (1 << 24)
            data += len(data).to_bytes(3, "big")
            if self.p.ec:
                data += b"\x00"
                data += crc32_trailer(data)
        return data

    def set_stats_mode(self, enable: bool = True):
        """Pass-1 rc_stat collection through the planner (plan_symbol
        tallies the same (state value, bit) counters the host encoder
        does); read with twopass.collect_stats on .native."""
        self.lib.ffv1rt_set_stats_mode(self.native.handle,
                                       1 if enable else 0)
