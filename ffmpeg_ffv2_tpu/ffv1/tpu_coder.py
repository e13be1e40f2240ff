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
        if self.p.ac == CODER_GOLOMB:
            raise NotImplementedError(
                "device coder covers the range-coder modes; Golomb-Rice "
                "uses the host path")
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
        self.extradata = (H.write_extradata(self.p)
                          if self.p.version > 1 else b"")
        self.picture_number = 0

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

    def encode(self, planes, force_keyframe=None) -> bytes:
        gop = self.cfg.gop_size
        keyframe = (gop == 0 or self.picture_number % gop == 0)
        if force_keyframe is not None:
            keyframe = bool(force_keyframe)
        svs, bits, lens, mx = self._plan(planes, keyframe)
        n = self.p.slice_count

        # lane matrices: ops + the 2-step flush tail, padded with NOPs.
        # Steps round up to a power of two so the jitted scan is reused
        # across frames instead of recompiling per op count.
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

        chunks = []
        for si in range(n):
            data = compact_lane(first[:, si], fcount[:, si], fval[:, si])
            if si > 0 or self.p.version > 2:
                assert len(data) < (1 << 24)
                data += len(data).to_bytes(3, "big")
                if self.p.ec:
                    data += b"\x00"
                    data += crc32_trailer(data)
            chunks.append(data)
        self.picture_number += 1
        return b"".join(chunks)
