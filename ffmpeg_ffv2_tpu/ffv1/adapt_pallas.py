"""Pallas adapt kernel: the FFV1 state-table walk on the TPU core.

Same semantics as device_coder.adapt_reference (which is the CPU/dryrun
path): the grid iterates tiles sequentially; each tile walks its cell rows
(cap from the scalar-prefetched tile tables), keeping the 128 lanes' 32
slot states as a (32, 128) register carry.  One lanewise dynamic gather
from the packed zero/one transition tables resolves all 4096 state
transitions per row.  Split groups hand their states to the successor
sub-lane through an HBM carry buffer: tile i writes its end states to
carry[i] with a *waited* manual DMA before the grid step ends, so a later
tile's read of carry[pred] (also manual) observes final data — pred may
be as close as the immediately preceding grid step, which rules out the
pipelined output-DMA path.

Rows past a tile's cap inside its last chunk belong to the NEXT tile:
their state updates are masked, and the garbage sv bytes the chunk DMA
writes there are overwritten when the later tile writes its own rows
(the grid runs tiles in order on the single core).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .device_coder import lookup_packed, n_sv_words, payload_field

CHUNK = 512


def _kernel_emission(caps_ref, bases_ref, preds_ref,       # scalar prefetch
            ch1_hbm, s0_ref, table_ref, carry_alias,
            sv_hbm, carry_hbm,
            in_scr, out_scr, carry_scr, dma_sems,
            *, code_bits: int, ev_words: int):
    i = pl.program_id(0)
    cap = caps_ref[i]
    base = bases_ref[i]
    pred = preds_ref[i]
    R = max(0, code_bits - 10)

    @pl.when(cap > 0)
    def _tile():
        table = jnp.broadcast_to(table_ref[0, :], (32, 128))

        @pl.when(pred >= 0)
        def _load_pred():
            cp = pltpu.make_async_copy(
                carry_hbm.at[pl.ds(jnp.maximum(pred, 0), 1)],
                carry_scr, dma_sems.at[0])
            cp.start()
            cp.wait()

        s0blk = s0_ref[0]                         # (33, 128)
        cont = (s0blk[32:33, :] > 0) & (pred >= 0)
        s_init = jnp.where(cont, carry_scr[0], s0blk[:32, :])

        nchunks = pl.cdiv(cap, CHUNK)

        def chunk_body(c, s):
            row0 = base + c * CHUNK
            cp_in = pltpu.make_async_copy(
                ch1_hbm.at[pl.ds(row0, CHUNK)], in_scr, dma_sems.at[1])
            cp_in.start()
            cp_in.wait()

            # slot rows are PERMUTED (device_coder.SLOT_AT_ROW): row r
            # holds slot 4*(r&7) + (r>>3), so the sv output packs into
            # the 8 little-endian int32 words the op assembly wants with
            # three contiguous sublane-block shifts — no int8 transpose
            rr = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)
            slot_ids = 4 * (rr & 7) + (rr >> 3)

            def step(t, s):
                # all masks int32 in (32, 128) — Mosaic cannot reshape or
                # transpose 1-bit vectors, so booleans appear only in the
                # final selects (2-D comparisons, no layout changes)
                row = in_scr[t, :]
                if code_bits > 10:
                    _m, _b, _vb = payload_field(code_bits)
                    okpx = (row >> _vb) & 1
                    v0 = (row & _m) - _b
                else:
                    okpx = (row >> 13) & 1
                    v0 = (row & 0xFFF) - 2048
                okpx = okpx * ((c * CHUNK + t) < cap).astype(jnp.int32)
                v = jnp.broadcast_to(v0[None, :], (32, 128))
                okpx = jnp.broadcast_to(okpx[None, :], (32, 128))
                a = jnp.abs(v)
                f = a.astype(jnp.float32)
                e = (jax.lax.bitcast_convert_type(f, jnp.int32) >> 23) - 127
                nz = (v != 0).astype(jnp.int32)
                is0 = (slot_ids == 0).astype(jnp.int32)
                # first hits only; the FFMIN-capped repeats of slots
                # 10/31 (e > 9) run as sub-steps below
                eE = jnp.minimum(e + 1, 10)
                eM = jnp.minimum(e, 10)
                isexp = ((slot_ids >= 1) & (slot_ids <= eE)) \
                    .astype(jnp.int32)
                ismant = ((slot_ids >= 22) & (slot_ids <= 21 + eM)) \
                    .astype(jnp.int32)
                issign = (slot_ids == 11 + eM).astype(jnp.int32)
                valid = (is0 | (nz & (isexp | ismant | issign))) & okpx
                msh = jnp.where((slot_ids == 31) & (e > 9),
                                e - 1, slot_ids - 22)
                bit = (is0 * (1 - nz)
                       + isexp * (slot_ids <= e).astype(jnp.int32)
                       + ismant * ((a >> jnp.maximum(msh, 0)) & 1)
                       + issign * (v < 0).astype(jnp.int32))
                vb = valid != 0
                sv = jnp.where(vb, s, 0)
                # emission index of each slot's FIRST hit (the position
                # of its sv byte in the pixel's rac-op stream):
                #   slot 0 -> 0; exp slot j -> j; sign -> 2e+2;
                #   mantissa slot 22+i -> 2e+1-i, except slot 31's
                #   first hit when e > 9 lands at k = e+2 (i = e-1)
                k_mant = jnp.where((slot_ids == 31) & (e > 9), e + 2,
                                   2 * e + 1 - (slot_ids - 22))
                kk = (isexp * slot_ids + issign * (2 * e + 2)
                      + ismant * k_mant)
                shifted = sv << ((kk & 3) * 8)
                kw = kk >> 2
                accs = [jnp.sum(jnp.where(kw == m, shifted, 0), axis=0,
                                keepdims=True)
                        for m in range(ev_words)]
                idx9 = bit * 256 + s
                ns = lookup_packed(table, idx9)
                s = jnp.where(vb, ns, s)
                if R > 0:
                    # repeat hits of slots 10/31 (e > 9): sub-step j is
                    # hit j+1; emission k = 10+j (slot 10, the exp run)
                    # and e+2+j (slot 31, the mantissa run)
                    is10 = (slot_ids == 10).astype(jnp.int32)
                    is31 = (slot_ids == 31).astype(jnp.int32)
                    e_lane = e[:1, :]
                    for j in range(1, R + 1):
                        vj = ((is10 * (e >= 9 + j)
                               + is31 * (e >= 10 + j)) & okpx)
                        bj = (is10 * (e >= j + 10).astype(jnp.int32)
                              + is31 * ((a >> jnp.maximum(e - 1 - j, 0))
                                        & 1))
                        vjb = vj != 0
                        svj = jnp.where(vjb, s, 0)
                        val10 = jnp.sum(svj * is10, axis=0, keepdims=True)
                        val31 = jnp.sum(svj * is31, axis=0, keepdims=True)
                        k10 = 10 + j
                        if k10 >> 2 < ev_words:
                            accs[k10 >> 2] = (accs[k10 >> 2]
                                              | (val10 << ((k10 & 3) * 8)))
                        k31 = e_lane + 2 + j
                        sh31 = val31 << ((k31 & 3) * 8)
                        k31w = k31 >> 2
                        for m in range(ev_words):
                            accs[m] = accs[m] + jnp.where(k31w == m,
                                                          sh31, 0)
                        nsj = lookup_packed(table, bj * 256 + s)
                        s = jnp.where(vjb, nsj, s)
                out_scr[t] = jnp.concatenate(accs, axis=0)
                return s

            # 4x unroll: the dependent chain per row is short (gather ->
            # select); the fori_loop's per-iteration overhead dominates
            def step4(q, s):
                for u in range(4):
                    s = step(q * 4 + u, s)
                return s

            s = jax.lax.fori_loop(0, CHUNK // 4, step4, s)
            cp_out = pltpu.make_async_copy(
                out_scr, sv_hbm.at[pl.ds(row0, CHUNK)], dma_sems.at[2])
            cp_out.start()
            cp_out.wait()
            return s

        s_end = jax.lax.fori_loop(0, nchunks, chunk_body, s_init)

        carry_scr[0] = s_end
        cp_c = pltpu.make_async_copy(
            carry_scr, carry_hbm.at[pl.ds(i, 1)], dma_sems.at[0])
        cp_c.start()
        cp_c.wait()


def _kernel_slotpack(caps_ref, bases_ref, preds_ref,       # scalar prefetch
            ch1_hbm, s0_ref, table_ref, carry_alias,
            sv_hbm, carry_hbm,
            in_scr, out_scr, carry_scr, dma_sems,
            *, code_bits: int):
    i = pl.program_id(0)
    cap = caps_ref[i]
    base = bases_ref[i]
    pred = preds_ref[i]
    R = max(0, code_bits - 10)

    @pl.when(cap > 0)
    def _tile():
        table = jnp.broadcast_to(table_ref[0, :], (32, 128))

        @pl.when(pred >= 0)
        def _load_pred():
            cp = pltpu.make_async_copy(
                carry_hbm.at[pl.ds(jnp.maximum(pred, 0), 1)],
                carry_scr, dma_sems.at[0])
            cp.start()
            cp.wait()

        s0blk = s0_ref[0]                         # (33, 128)
        cont = (s0blk[32:33, :] > 0) & (pred >= 0)
        s_init = jnp.where(cont, carry_scr[0], s0blk[:32, :])

        nchunks = pl.cdiv(cap, CHUNK)

        def chunk_body(c, s):
            row0 = base + c * CHUNK
            cp_in = pltpu.make_async_copy(
                ch1_hbm.at[pl.ds(row0, CHUNK)], in_scr, dma_sems.at[1])
            cp_in.start()
            cp_in.wait()

            # slot rows are PERMUTED (device_coder.SLOT_AT_ROW): row r
            # holds slot 4*(r&7) + (r>>3), so the sv output packs into
            # the 8 little-endian int32 words the op assembly wants with
            # three contiguous sublane-block shifts — no int8 transpose
            rr = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)
            slot_ids = 4 * (rr & 7) + (rr >> 3)

            def step(t, s):
                # all masks int32 in (32, 128) — Mosaic cannot reshape or
                # transpose 1-bit vectors, so booleans appear only in the
                # final selects (2-D comparisons, no layout changes)
                row = in_scr[t, :]
                if code_bits > 10:
                    _m, _b, _vb = payload_field(code_bits)
                    okpx = (row >> _vb) & 1
                    v0 = (row & _m) - _b
                else:
                    okpx = (row >> 13) & 1
                    v0 = (row & 0xFFF) - 2048
                okpx = okpx * ((c * CHUNK + t) < cap).astype(jnp.int32)
                v = jnp.broadcast_to(v0[None, :], (32, 128))
                okpx = jnp.broadcast_to(okpx[None, :], (32, 128))
                a = jnp.abs(v)
                f = a.astype(jnp.float32)
                e = (jax.lax.bitcast_convert_type(f, jnp.int32) >> 23) - 127
                nz = (v != 0).astype(jnp.int32)
                is0 = (slot_ids == 0).astype(jnp.int32)
                # first hits only; the FFMIN-capped repeats of slots
                # 10/31 (e > 9) run as sub-steps below
                eE = jnp.minimum(e + 1, 10)
                eM = jnp.minimum(e, 10)
                isexp = ((slot_ids >= 1) & (slot_ids <= eE)) \
                    .astype(jnp.int32)
                ismant = ((slot_ids >= 22) & (slot_ids <= 21 + eM)) \
                    .astype(jnp.int32)
                issign = (slot_ids == 11 + eM).astype(jnp.int32)
                valid = (is0 | (nz & (isexp | ismant | issign))) & okpx
                msh = jnp.where((slot_ids == 31) & (e > 9),
                                e - 1, slot_ids - 22)
                bit = (is0 * (1 - nz)
                       + isexp * (slot_ids <= e).astype(jnp.int32)
                       + ismant * ((a >> jnp.maximum(msh, 0)) & 1)
                       + issign * (v < 0).astype(jnp.int32))
                vb = valid != 0
                sv = jnp.where(vb, s, 0)
                packed = (sv[0:8] | (sv[8:16] << 8)
                          | (sv[16:24] << 16) | (sv[24:32] << 24))
                idx9 = bit * 256 + s
                ns = lookup_packed(table, idx9)
                s = jnp.where(vb, ns, s)
                if R > 0:
                    # repeat hits of slots 10/31: sub-step j = hit j+1
                    is10 = (slot_ids == 10).astype(jnp.int32)
                    is31 = (slot_ids == 31).astype(jnp.int32)
                    wsel = is10 + 256 * is31
                    pairs = []
                    for j in range(1, R + 1):
                        vj = ((is10 * (e >= 9 + j)
                               + is31 * (e >= 10 + j)) & okpx)
                        bj = (is10 * (e >= j + 10).astype(jnp.int32)
                              + is31 * ((a >> jnp.maximum(e - 1 - j, 0))
                                        & 1))
                        vjb = vj != 0
                        svj = jnp.where(vjb, s, 0)
                        pairs.append(jnp.sum(svj * wsel, axis=0,
                                             keepdims=True))
                        nsj = lookup_packed(table, bj * 256 + s)
                        s = jnp.where(vjb, nsj, s)
                    if len(pairs) % 2:
                        pairs.append(jnp.zeros_like(pairs[0]))
                    ext = jnp.concatenate(
                        [pairs[2 * w] | (pairs[2 * w + 1] << 16)
                         for w in range(len(pairs) // 2)], axis=0)
                    packed = jnp.concatenate([packed, ext], axis=0)
                out_scr[t] = packed
                return s

            # 4x unroll: the dependent chain per row is short (gather ->
            # select); the fori_loop's per-iteration overhead dominates
            def step4(q, s):
                for u in range(4):
                    s = step(q * 4 + u, s)
                return s

            s = jax.lax.fori_loop(0, CHUNK // 4, step4, s)
            cp_out = pltpu.make_async_copy(
                out_scr, sv_hbm.at[pl.ds(row0, CHUNK)], dma_sems.at[2])
            cp_out.start()
            cp_out.wait()
            return s

        s_end = jax.lax.fori_loop(0, nchunks, chunk_body, s_init)

        carry_scr[0] = s_end
        cp_c = pltpu.make_async_copy(
            carry_scr, carry_hbm.at[pl.ds(i, 1)], dma_sems.at[0])
        cp_c.start()
        cp_c.wait()


@functools.partial(jax.jit,
                   static_argnames=("tiles_cap", "cellrows_cap",
                                    "code_bits", "ev_words", "interpret",
                                    "emission_order"))
def adapt_pallas(ch1_cells, tile_caps, tile_bases, tile_pred, s0_blocks,
                 packed_table, tiles_cap: int, cellrows_cap: int,
                 code_bits: int = 10, ev_words: int = 2,
                 interpret: bool = False, emission_order: bool = False):
    """Adaptation walk.

    Default (emission_order=False): the SLOT-PACKED kernel — returns
    (sv_words (CELLROWS_CAP, W, 128) int32, W = n_sv_words: 8 packed
    pre-update state words, word j = slots 4j..4j+3 little-endian, plus
    repeat-pair words for coding depths > 10).  The caller repacks to
    emission order (repack_emission_order) before the unsort.

    emission_order=True: the kernel packs each pixel's sv bytes at
    their emission positions in-register (byte k of word k>>2 = the
    k-th rac op's operand) so the slot-packed intermediate never
    round-trips HBM and no repack pass is needed.  NOT the default:
    on the axon TPU platform this variant intermittently faults the
    backend (INTERNAL / FAILED_PRECONDITION at the next fetch) when
    run inside the full encode pipeline, while passing in isolation —
    see PROGRESS round-5 notes; opt in via FFV1_ADAPT_EMISSION=1 once
    the platform issue is resolved.

    Both return end_states (TILES_CAP, 32, 128) int32 in SLOT_AT_ROW
    row order as the second output.  cellrows_cap must leave >= CHUNK
    rows of slack past the last tile (device_coder sizes it so)."""
    carry0 = jnp.zeros((tiles_cap, 32, 128), jnp.int32)
    table = packed_table.reshape(1, 128)
    W = ev_words if emission_order else n_sv_words(code_bits)
    kern = (functools.partial(_kernel_emission, code_bits=code_bits,
                              ev_words=ev_words) if emission_order else
            functools.partial(_kernel_slotpack, code_bits=code_bits))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tiles_cap,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # ch1 cells
            pl.BlockSpec((1, 33, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # s0 blocks
            pl.BlockSpec(memory_space=pltpu.VMEM),          # table
            pl.BlockSpec(memory_space=pl.ANY),           # carry alias
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),           # sv/ev cells
            pl.BlockSpec(memory_space=pl.ANY),           # carry
        ),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, 128), jnp.int32),
            pltpu.VMEM((CHUNK, W, 128), jnp.int32),
            pltpu.VMEM((1, 32, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    sv, carry = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((cellrows_cap, W, 128),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((tiles_cap, 32, 128), jnp.int32)),
        input_output_aliases={6: 1},     # carry buffer in == out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_caps, tile_bases, tile_pred,
      ch1_cells, s0_blocks, table, carry0)
    return sv, carry
