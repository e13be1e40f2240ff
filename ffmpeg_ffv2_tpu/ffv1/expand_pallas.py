"""Pallas op-stream expansion: per-pixel sv words -> compacted rac ops.

Replaces the XLA emit -> pack -> shift-compact -> overlay chain (round 2's
largest post-adapt cost: a masked (S, npix*k_max) emission grid of ~65M
slots at 1080p, log-shifted into place) with ONE streaming kernel over the
op domain:

* After the unsort, per-pixel packed sv words are in STREAM order and the
  per-pixel op destinations ``base = hpad + exclusive_cumsum(counts)`` are
  monotone, so op j of slice s belongs to the unique record with
  ``base <= j < base + count`` — 128 consecutive ops touch at most 128
  consecutive records.
* The kernel walks 2048-op chunks (grid = slices x chunks, sequential on
  the core).  A record POINTER carried in SMEM scratch tracks the record
  containing the next chunk's first op — no precomputed op->record table
  and no host searchsorted.  Each chunk DMAs one 17-block record window
  into VMEM; each 128-op row aligns its 128-record sub-window with two
  dynamic lane rolls, binary-searches its per-op record offset with 7
  lanewise gathers (``take_along_axis`` along lanes), gathers all record
  channels at once, and evaluates the emission formulas
  (device_coder.emission_slots / emission_source) elementwise.  The row
  then advances the carried pointer from its own lane-127 record span.
* Slice headers, the keyframe bit, the v1 terminator (state 129,
  rangecoder.c:109-123) and the two flush steps ride the SAME path as
  "marker records" (bit 30 of the diff channel) prepended/appended to the
  pixel records — there is no separate overlay stage.  Prefix rows beyond
  a slice's true header length hold NOP markers, so pixel ops start at the
  uniform offset hpad for every slice (the arithmetic coder skips NOPs;
  packet bytes are unchanged).

Record channel layout (C = W + 2 rows per 128-record block):
  row 0: base (absolute op index; padding records carry 2^30-1 so the
         search never selects them)
  row 1: dchan — pixels: (diff + 32768) & 0xFFFF;
         markers: (1 << 30) | (mode << 9) | (bit << 8) | sv
  rows 2..C-1: the W packed sv words (device_coder.pack_sv_words order)

Output: (S, nrows, 128) int32 op words  [mode:2 | bit:1 | sv:8]  at bits
[10:9], [8], [7:0] — the layout rac_pallas_packed consumes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OPROW = 128                  # ops per kernel row
CHUNK_ROWS = 16              # op rows per grid step (2048 ops)
WBLK = CHUNK_ROWS + 1        # record window blocks per chunk
MODE_NOP, MODE_OP, MODE_FLUSH1, MODE_FLUSH2 = 0, 1, 2, 3
PAD_BASE = (1 << 30) - 1


def _expand_kernel(tot_ref, win_hbm, out_ref, scr, out_scr, ptr_ref, sem,
                   *, nblk: int, C: int, W: int, code_bits: int):
    """C is the PADDED channel count (multiple of 8 — the chip's DMA
    engine requires sublane-aligned copies); W the true sv word count."""
    s = pl.program_id(0)
    c = pl.program_id(1)
    j0c = c * (CHUNK_ROWS * OPROW)
    total = tot_ref[s]
    live = j0c <= total + 2

    @pl.when(c == 0)
    def _reset():
        ptr_ref[0] = 0

    @pl.when(jnp.logical_not(live))
    def _skip():
        out_ref[0] = jnp.zeros((CHUNK_ROWS, 128), jnp.int32)

    @pl.when(live)
    def _chunk():
        ptr0 = ptr_ref[0]                 # record containing op j0c
        pb = ptr0 >> 7
        cp = pltpu.make_async_copy(
            win_hbm.at[pl.ds(s * nblk + pb, WBLK)], scr, sem)
        cp.start()
        cp.wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def row(r, ptr_row):
            # align a 128-record window starting at record ptr_row
            rel = ptr_row - pb * 128      # 0 .. 2047
            b = rel >> 7
            rl = rel & 127
            sh = (128 - rl) & 127
            lo = scr[b]                   # (C, 128)
            hi = scr[b + 1]
            lot = pltpu.roll(lo, sh, axis=1)
            hit = pltpu.roll(hi, sh, axis=1)
            lanec = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 1)
            alig = jnp.where(lanec < 128 - rl, lot, hit)

            # Mosaic's lane gather wants >= 8 sublanes: run the binary
            # search on an 8-row broadcast of the base channel
            abase = alig[0:1]             # (1, 128)
            abase8 = jnp.broadcast_to(abase, (8, 128))
            j = j0c + r * 128 + lane
            ptr = jnp.zeros((1, 128), jnp.int32)
            for st in (64, 32, 16, 8, 4, 2, 1):
                cand = ptr + st
                bv = jnp.take_along_axis(
                    abase8, jnp.broadcast_to(cand, (8, 128)), axis=1)[0:1]
                ptr = jnp.where(bv <= j, cand, ptr)
            rec = jnp.take_along_axis(
                alig, jnp.broadcast_to(ptr, (C, 128)), axis=1)
            bb = rec[0:1]
            dch = rec[1:2]
            k = j - bb

            marker = (dch >> 30) & 1
            mout = jnp.where(k == 0, dch & 0x7FF, 0)

            d = (dch & 0xFFFF) - 32768
            a = jnp.abs(d)
            f = a.astype(jnp.float32)
            e = (jax.lax.bitcast_convert_type(f, jnp.int32) >> 23) - 127
            nz = (d != 0).astype(jnp.int32)
            e = jnp.where(nz != 0, e, -1)
            count = jnp.where(nz != 0, 2 * e + 3, 1)
            okk = (k < count).astype(jnp.int32)
            mant_i = 2 * e + 1 - k
            eE = jnp.minimum(e + 1, 10)
            eM = jnp.minimum(e, 10)
            slot = jnp.where(
                k == 0, 0,
                jnp.where(k <= e, jnp.minimum(k, 10),
                          jnp.where(k == e + 1, eE,
                                    jnp.where(k <= 2 * e + 1,
                                              22 + jnp.minimum(mant_i, 9),
                                              11 + eM))))
            bit = jnp.where(
                k == 0, 1 - nz,
                jnp.where(k <= e, 1,
                          jnp.where(k == e + 1, 0,
                                    jnp.where(k <= 2 * e + 1,
                                              (a >> jnp.maximum(mant_i, 0))
                                              & 1,
                                              (d < 0).astype(jnp.int32)))))
            if code_bits <= 10:
                word_i = slot >> 2
                shift = (slot & 3) * 8
            else:
                h10 = jnp.where(k <= e, k - 9, e - 8)
                h31 = k - e - 1
                hh = jnp.where(slot == 10, jnp.maximum(h10, 1),
                               jnp.where(slot == 31, jnp.maximum(h31, 1),
                                         1))
                jj = hh - 1
                word_i = jnp.where(jj == 0, slot >> 2, 8 + (jj - 1) // 2)
                shift = jnp.where(
                    jj == 0, (slot & 3) * 8,
                    ((jj - 1) % 2) * 16
                    + jnp.where(slot == 31, 8, 0))
            sv = jnp.zeros((1, 128), jnp.int32)
            for wi in range(W):
                sv = jnp.where(word_i == wi, rec[2 + wi:3 + wi], sv)
            sv = (sv >> shift) & 0xFF
            rout = okk * (sv | (bit << 8) | (MODE_OP << 9))

            out_scr[pl.ds(r, 1)] = jnp.where(marker != 0, mout, rout)

            # advance the pointer to the record containing op j0r + 128:
            # lane 127's record span decides same-record vs next
            fullcnt = jnp.where(marker != 0, 1, count)
            nb127 = jnp.max(jnp.where(lane == 127, bb + fullcnt, 0))
            off127 = jnp.max(ptr)
            jnext = j0c + r * 128 + 128
            return ptr_row + off127 + jnp.where(nb127 <= jnext, 1, 0)

        ptr_f = jax.lax.fori_loop(0, CHUNK_ROWS, row, ptr0)
        ptr_ref[0] = ptr_f
        out_ref[0] = out_scr[...]


@functools.partial(jax.jit, static_argnames=("nrows", "nblk", "C", "W",
                                             "code_bits", "interpret"))
def expand_pallas(win, totals, nrows: int, nblk: int, C: int, W: int,
                  code_bits: int, interpret: bool = False):
    """win: (S*nblk + WBLK, C, 128) int32 record buffer (C padded to a
    multiple of 8); totals: (S,) int32 per-slice total op count
    (ex-tail).  Returns (S, nrows, 128) int32 op words."""
    S = totals.shape[0]
    assert nrows % CHUNK_ROWS == 0 and C % 8 == 0
    grid = (S, nrows // CHUNK_ROWS)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, CHUNK_ROWS, 128),
                               lambda s, c, *_: (s, c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WBLK, C, 128), jnp.int32),
            pltpu.VMEM((CHUNK_ROWS, 128), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_expand_kernel, nblk=nblk, C=C, W=W,
                          code_bits=code_bits),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, nrows, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(totals, win)
    return out


def build_expand_window(words_n, diff, svp, btp, hlen, op_cap: int):
    """XLA glue: interleave the stream-order record channels.

    words_n: W arrays (S, npix) packed sv words (stream order, from the
    unsort); diff: (S, npix); svp/btp/hlen: host-planned prefix ops.
    Returns (win (S*nblk + WBLK, C, 128), totals (S,), n_ops (S,), nblk,
    C) with C = W + 2 padded up to a multiple of 8.
    """
    from .device_coder import event_count
    i32 = jnp.int32
    S, npix = diff.shape
    hpad = int(svp.shape[1])
    W = len(words_n)
    C = -(-(W + 2) // 8) * 8          # DMA wants sublane-aligned blocks
    counts = event_count(diff)
    csum = jnp.cumsum(counts, axis=1)
    base_px = hpad + csum - counts
    total = hpad + csum[:, -1]                       # (S,)

    nrec = hpad + npix + 3
    nblk = -(-nrec // 128) + WBLK                    # per-slice pad blocks
    pad = nblk * 128 - nrec

    r = jnp.arange(hpad, dtype=i32)[None, :]
    in_hdr = r < hlen[:, None]
    pfx = (1 << 30) | jnp.where(
        in_hdr,
        (MODE_OP << 9) | (btp[:, :hpad] << 8) | svp[:, :hpad], 0)
    tail = jnp.broadcast_to(jnp.asarray(
        [(1 << 30) | (MODE_OP << 9) | 129,
         (1 << 30) | (MODE_FLUSH1 << 9),
         (1 << 30) | (MODE_FLUSH2 << 9)], i32)[None, :], (S, 3))
    padm = jnp.full((S, pad), (1 << 30), i32)

    dchan = jnp.concatenate(
        [pfx, (diff + 32768) & 0xFFFF, tail, padm], axis=1)
    basec = jnp.concatenate(
        [jnp.broadcast_to(r, (S, hpad)), base_px,
         total[:, None] + jnp.arange(3, dtype=i32)[None, :],
         jnp.full((S, pad), PAD_BASE, i32)], axis=1)
    zpre = jnp.zeros((S, hpad), i32)
    zpost = jnp.zeros((S, 3 + pad), i32)
    chans = [basec, dchan] + [
        jnp.concatenate([zpre, wd, zpost], axis=1) for wd in words_n]
    chans += [jnp.zeros((S, nblk * 128), i32)] * (C - 2 - W)
    win = jnp.stack([ch.reshape(S, nblk, 128) for ch in chans], axis=2)
    win = win.reshape(S * nblk, C, 128)
    win = jnp.concatenate(
        [win, jnp.zeros((WBLK, C, 128), i32)
         .at[:, 0, :].set(PAD_BASE)
         .at[:, 1, :].set(1 << 30)], axis=0)
    return win, total, total + 3, nblk, C


def expand_ops_reference(words_n, diff, svp, btp, hlen, op_cap: int,
                         code_bits: int):
    """Pure-XLA reference of the expand kernel (CPU tests / dryrun):
    same op-word layout, computed with the emission grids."""
    from .device_coder import (emission_slots, emission_source,
                               event_count, k_max_for_bits)
    from .device_coder import shift_compact
    i32 = jnp.int32
    S, npix = diff.shape
    hpad = int(svp.shape[1])
    k_max = k_max_for_bits(code_bits)
    slot, bit, valid = emission_slots(diff, k_max)
    if code_bits > 10:
        wsel, shf = emission_source(diff, k_max)
    else:
        wsel, shf = slot >> 2, (slot & 3) * 8
    sv = jnp.zeros_like(slot)
    for j in range(len(words_n)):
        sv = jnp.where(wsel == j, words_n[j][..., None], sv)
    sv = (sv >> shf) & 0xFF

    counts = event_count(diff)
    koff = jnp.cumsum(counts, axis=1)
    total = hpad + koff[:, -1]
    off = (hpad + (koff - counts)[..., None]
           + jnp.arange(k_max, dtype=i32)[None, None, :])

    def lpad(a, fill=0):
        return jnp.concatenate(
            [jnp.full((S, hpad), fill, a.dtype),
             a.reshape(S, -1)], axis=1)

    (sv_c, bit_c), valid_c = shift_compact(
        [lpad(sv), lpad(bit)], lpad(valid, False), lpad(off), op_cap)

    pos = jnp.arange(op_cap, dtype=i32)[None, :]
    in_hdr = pos < hlen[:, None]
    hsv = jnp.pad(svp, ((0, 0), (0, max(0, op_cap - hpad))))[:, :op_cap]
    hbt = jnp.pad(btp, ((0, 0), (0, max(0, op_cap - hpad))))[:, :op_cap]
    sv_c = jnp.where(in_hdr, hsv, sv_c)
    bit_c = jnp.where(in_hdr, hbt, bit_c)
    term = pos == total[:, None]
    sv_c = jnp.where(term, 129, sv_c)
    bit_c = jnp.where(term, 0, bit_c)
    mode = jnp.where(in_hdr | (valid_c & (pos >= hpad)) | term, MODE_OP,
                     jnp.where(pos == total[:, None] + 1, MODE_FLUSH1,
                               jnp.where(pos == total[:, None] + 2,
                                         MODE_FLUSH2, MODE_NOP)))
    opw = jnp.where(mode == MODE_OP, (sv_c & 0xFF) | (bit_c << 8), 0) \
        | (mode << 9)
    return opw, total + 3
