"""Pallas kernel for the lane-parallel range-coder arithmetic.

Same recursion as tpu_coder.rac_scan_lanes, but as a single Mosaic kernel:
the (low, range, pending, pending_count) carry lives in VMEM scratch that
persists across the step-chunk grid, and the inner fori_loop advances one
op per iteration for all lanes at once — no per-step dispatch overhead.
Lanes pad to the 128-lane vector width; op streams chunk through VMEM.

Verified bit-identical to the scan formulation (and therefore to the host
coder) in tests/test_tpu_coder.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MODE_OP = 1
MODE_FLUSH1 = 2
MODE_FLUSH2 = 3

LANE = 128          # TPU vector lane width
CHUNK = 512         # op steps per grid iteration


def _coder_kernel(sv_ref, bit_ref, mode_ref,
                  first_ref, fcount_ref, fval_ref,
                  low_ref, rng_ref, pend_ref, pcnt_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        low_ref[...] = jnp.zeros_like(low_ref)
        rng_ref[...] = jnp.full_like(rng_ref, 0xFF00)
        pend_ref[...] = jnp.full_like(pend_ref, -1)
        pcnt_ref[...] = jnp.zeros_like(pcnt_ref)

    def body(i, _):
        low = low_ref[0, :]
        rng = rng_ref[0, :]
        pending = pend_ref[0, :]
        pcount = pcnt_ref[0, :]

        s = sv_ref[i, :]
        b = bit_ref[i, :]
        m = mode_ref[i, :]
        is_op = m == MODE_OP
        is_flush1 = m == MODE_FLUSH1
        is_flush = is_flush1 | (m == MODE_FLUSH2)

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

        emit = renorm & (~case_b) & (case_c | case_d)
        first_ref[i, :] = jnp.where(
            emit, jnp.where(case_c, pending, pending + 1) & 0xFF, -1)
        fcount_ref[i, :] = jnp.where(emit, pcount, 0)
        fval_ref[i, :] = jnp.where(case_c, 0xFF, 0x00)

        pend_ref[0, :] = jnp.where(
            renorm,
            jnp.where(case_b | case_c, low1 >> 8,
                      jnp.where(case_d, (low1 >> 8) & 0xFF, pending)),
            pending)
        pcnt_ref[0, :] = jnp.where(
            renorm,
            jnp.where(case_b | case_c | case_d,
                      jnp.where(case_b, pcount, 0), pcount + 1),
            pcount)
        low_ref[0, :] = jnp.where(renorm, (low1 & 0xFF) << 8, low1)
        rng_ref[0, :] = jnp.where(renorm, rng1 << 8, rng1)
        return 0

    jax.lax.fori_loop(0, sv_ref.shape[0], body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rac_pallas_lanes(sv, bit, mode, interpret=False):
    """sv/bit/mode int32 [steps, lanes] (steps % CHUNK == 0, lanes % 128
    == 0) -> staged (first, fcount, fval) int32 [steps, lanes]."""
    steps, lanes = sv.shape
    grid = (steps // CHUNK,)
    spec = pl.BlockSpec((CHUNK, lanes), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _coder_kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(jax.ShapeDtypeStruct((steps, lanes), jnp.int32),) * 3,
        scratch_shapes=[pltpu.VMEM((1, lanes), jnp.int32)] * 4,
        interpret=interpret,
    )(sv, bit, mode)
    return out


def _coder_kernel_packed(op_ref, first_ref, fcount_ref, fval_ref,
                         low_ref, rng_ref, pend_ref, pcnt_ref):
    """Packed-word variant: ONE input ref of op words
    [mode:2 | bit:1 | sv:8] (bits [10:9], [8], [7:0]) — a third of the
    coder kernel's HBM read traffic vs the 3-channel form."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        low_ref[...] = jnp.zeros_like(low_ref)
        rng_ref[...] = jnp.full_like(rng_ref, 0xFF00)
        pend_ref[...] = jnp.full_like(pend_ref, -1)
        pcnt_ref[...] = jnp.zeros_like(pcnt_ref)

    def body(i, _):
        low = low_ref[0, :]
        rng = rng_ref[0, :]
        pending = pend_ref[0, :]
        pcount = pcnt_ref[0, :]

        w = op_ref[i, :]
        s = w & 0xFF
        b = (w >> 8) & 1
        m = (w >> 9) & 3
        is_op = m == MODE_OP
        is_flush1 = m == MODE_FLUSH1
        is_flush = is_flush1 | (m == MODE_FLUSH2)

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

        emit = renorm & (~case_b) & (case_c | case_d)
        first_ref[i, :] = jnp.where(
            emit, jnp.where(case_c, pending, pending + 1) & 0xFF, -1)
        fcount_ref[i, :] = jnp.where(emit, pcount, 0)
        fval_ref[i, :] = jnp.where(case_c, 0xFF, 0x00)

        pend_ref[0, :] = jnp.where(
            renorm,
            jnp.where(case_b | case_c, low1 >> 8,
                      jnp.where(case_d, (low1 >> 8) & 0xFF, pending)),
            pending)
        pcnt_ref[0, :] = jnp.where(
            renorm,
            jnp.where(case_b | case_c | case_d,
                      jnp.where(case_b, pcount, 0), pcount + 1),
            pcount)
        low_ref[0, :] = jnp.where(renorm, (low1 & 0xFF) << 8, low1)
        rng_ref[0, :] = jnp.where(renorm, rng1 << 8, rng1)
        return 0

    jax.lax.fori_loop(0, op_ref.shape[0], body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rac_pallas_packed(opw, interpret=False):
    """opw int32 [steps, lanes] packed op words (steps % CHUNK == 0,
    lanes % 128 == 0) -> staged (first, fcount, fval) int32
    [steps, lanes]."""
    steps, lanes = opw.shape
    grid = (steps // CHUNK,)
    spec = pl.BlockSpec((CHUNK, lanes), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _coder_kernel_packed,
        grid=grid,
        in_specs=[spec],
        out_specs=(spec, spec, spec),
        out_shape=(jax.ShapeDtypeStruct((steps, lanes), jnp.int32),) * 3,
        scratch_shapes=[pltpu.VMEM((1, lanes), jnp.int32)] * 4,
        interpret=interpret,
    )(opw)
    return out


def pad_for_pallas(sv, bit, mode):
    """Pad [steps, lanes] op matrices to CHUNK/LANE multiples."""
    steps, lanes = sv.shape
    ps = -(-steps // CHUNK) * CHUNK
    plns = -(-lanes // LANE) * LANE

    def pad(a):
        out = np.zeros((ps, plns), dtype=np.int32)
        out[:steps, :lanes] = a
        return out

    return pad(sv), pad(bit), pad(mode)
