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
* The kernel walks 4096-op chunks (grid = slices x chunks, sequential on
  the core).  A record POINTER carried in SMEM scratch tracks the record
  containing the next chunk's first op — no precomputed op->record table
  and no host searchsorted.  Each chunk DMAs one 34-block record window
  into VMEM (channel-major: one strided copy) and expands it with THREE
  chunk-wide dense passes — no per-row loop, no dynamic lane gathers:
    1. align: one dynamic roll per channel puts record ptr0 at q=0;
    2. distribute: each record moves to its op start position d = base -
       j0c by a 12-pass monotone log-shift (dests strictly increase with
       the source index, so intermediate positions stay distinct — the
       same collision-free argument as device_coder.shift_compact);
    3. fill: a 6-pass segmented forward fill propagates each record's
       channels across its op span (max span = 2*e_max + 3 <= 33).
  The emission formulas (device_coder.emission_slots / emission_source)
  then evaluate once on the filled (32, 128) chunk; k = pos - d.  The
  pointer advances by counting window bases <= the next chunk's first op.
* Slice headers, the keyframe bit, the v1 terminator (state 129,
  rangecoder.c:109-123) and the two flush steps ride the SAME path as
  "marker records" (bit 30 of the diff channel) prepended/appended to the
  pixel records — there is no separate overlay stage.  Prefix rows beyond
  a slice's true header length hold NOP markers, so pixel ops start at the
  uniform offset hpad for every slice (the arithmetic coder skips NOPs;
  packet bytes are unchanged).

Record buffer layout (channel-major: win[(C, S*nblk + WBLK, 128)]):
  channel 0: base (absolute op index; padding records carry 2^30-1 so
         the distribute drops them)
  channel 1: dchan — pixels: (diff + 32768) & 0xFFFF;
         markers: (1 << 30) | (mode << 9) | (bit << 8) | sv
  channels 2..C-1: the W packed sv words (device_coder.pack_sv_words
         order); C = W + 2 exactly (channel segments are (WBLK, 128),
         already sublane-aligned — no channel padding needed)

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
CHUNK_ROWS = 32              # op rows per grid step (4096 ops)
CHUNK = CHUNK_ROWS * OPROW   # ops per grid step
# Window blocks per chunk: a chunk can start 127 records into its first
# block, consume up to 4096 new records (all count-1), and the pointer
# advance may need to SEE one more (base == next chunk's first op):
# 127 + 1 + 4096 + 1 = 4225 records -> 34 blocks.
WBLK = CHUNK_ROWS + 2
OP_GRAN = CHUNK              # op_cap granularity the kernel requires
MODE_NOP, MODE_OP, MODE_FLUSH1, MODE_FLUSH2 = 0, 1, 2, 3
PAD_BASE = (1 << 30) - 1


def _shift_fwd(x, k: int):
    """Move element at flat position i of an (R, 128) row-major tile to
    position i + k (static k >= 1); vacated/overflowed slots get 0."""
    R = x.shape[0]
    kr, kl = k // 128, k % 128
    z = jnp.zeros((1, 128), x.dtype)

    def rows_down(t, m):
        if m == 0:
            return t
        return jnp.concatenate(
            [jnp.broadcast_to(z, (m, 128)), t[:R - m]], axis=0)

    if kl == 0:
        return rows_down(x, kr)
    r = pltpu.roll(x, kl, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    return jnp.where(lane >= kl, rows_down(r, kr), rows_down(r, kr + 1))


def _emit_formula(k, dch, svw, W: int, code_bits: int):
    """Emission formulas on a whole (R, 128) tile of ops.

    k: op index within its record; dch: the record's diff channel;
    svw: list of W (R, 128) packed sv words.  Returns the op words
    [mode:2 | bit:1 | sv:8]."""
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
    bit = jnp.where(
        k == 0, 1 - nz,
        jnp.where(k <= e, 1,
                  jnp.where(k == e + 1, 0,
                            jnp.where(k <= 2 * e + 1,
                                      (a >> jnp.maximum(mant_i, 0)) & 1,
                                      (d < 0).astype(jnp.int32)))))
    # sv words are EMISSION-ORDER packed (device_coder.
    # repack_emission_order): op k reads byte k, for every code depth
    word_i = k >> 2
    shift = (k & 3) * 8
    sv = jnp.zeros_like(k)
    for wi in range(W):
        sv = jnp.where(word_i == wi, svw[wi], sv)
    sv = (sv >> shift) & 0xFF
    rout = okk * (sv | (bit << 8) | (MODE_OP << 9))
    return jnp.where(marker != 0, mout, rout)


def _expand_kernel(tot_ref, win_hbm, out_ref, scr, ptr_ref, sem,
                   *, nblk: int, C: int, W: int, code_bits: int):
    """One 4096-op chunk: align -> distribute -> fill -> formulas.

    scr is channel-major (C, WBLK, 128); C = W + 2.  All work is dense
    (CHUNK_ROWS, 128) vector passes — the v1/v2 per-row walk (2 dynamic
    rolls + 8 lanewise gathers per 128 ops, ~1 us/row measured) is gone.
    """
    s = pl.program_id(0)
    c = pl.program_id(1)
    j0c = c * CHUNK
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
        ptr0 = ptr_ref[0]                 # last record with base <= j0c
        pb = ptr0 >> 7
        # per-channel copies (a single strided (C, WBLK, 128) copy with
        # a dynamic mid-dim offset hangs the DMA engine): all C start
        # together, so they pipeline
        cps = [pltpu.make_async_copy(
            win_hbm.at[ch, pl.ds(s * nblk + pb, WBLK)],
            scr.at[ch], sem.at[ch]) for ch in range(C)]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        # --- align: channel tiles with record ptr0 at flat position 0.
        # A[q] = window[rel + q]: one dynamic lane roll + row select.
        rel = ptr0 - pb * 128             # 0 .. 127
        sh = (128 - rel) & 127
        lane33 = jax.lax.broadcasted_iota(
            jnp.int32, (WBLK - 1, 128), 1)

        def align(ch):
            r = pltpu.roll(scr[ch], sh, axis=1)
            return jnp.where(lane33 < 128 - rel,
                             r[:WBLK - 1], r[1:WBLK])

        abase = align(0)                  # (33, 128) record bases

        # --- pointer advance: count records past the carry with
        # base <= next chunk's first op (bases strictly increase).
        q33 = (jax.lax.broadcasted_iota(
            jnp.int32, (WBLK - 1, 128), 0) * 128 + lane33)
        ptr_ref[0] = ptr0 + jnp.sum(
            ((abase <= j0c + CHUNK) & (q33 >= 1)).astype(jnp.int32))

        # --- distribute: record q -> op start d = base - j0c.  The
        # carry (q=0) covers j0c (d clamps to 0); records q >= 1 start
        # inside the chunk with d >= q, so shifts s = d - q are >= 0 and
        # monotone non-decreasing -> the 12-pass high-to-low log-shift
        # keeps all intermediate positions distinct (collision-free).
        # Valid elements (d < CHUNK) start at q <= d < CHUNK: the live
        # domain is exactly the (CHUNK_ROWS, 128) output tile.
        R = CHUNK_ROWS
        q = q33[:R]
        # d rides the TRUE base - j0c (the carry's is <= 0: its ops at
        # the chunk head have k = pos - d > pos); only the move bits
        # clamp to 0, so the carry stays at position 0.
        d = abase[:R] - j0c
        valid = ((d < CHUNK) & ((q == 0) | (d >= 1))).astype(jnp.int32)
        chans = [align(1)[:R]] + [align(2 + wi)[:R] for wi in range(W)]
        pos = q                           # flat position iota
        for b in range(11, -1, -1):
            k = 1 << b
            mv = valid & (jnp.maximum(d - pos, 0) >> b) & 1
            mvs = _shift_fwd(mv, k)
            d = jnp.where(mvs == 1, _shift_fwd(d, k), d)
            chans = [jnp.where(mvs == 1, _shift_fwd(ch, k), ch)
                     for ch in chans]
            valid = jnp.where(mvs == 1, 1, valid * (1 - mv))

        # --- fill: propagate each record across its op span (max span
        # 2*e_max + 3 = 33 ops for 16-bit diffs -> 6 doubling passes).
        for st in (1, 2, 4, 8, 16, 32):
            vs = _shift_fwd(valid, st)
            take = (1 - valid) * vs
            d = jnp.where(take == 1, _shift_fwd(d, st), d)
            chans = [jnp.where(take == 1, _shift_fwd(ch, st), ch)
                     for ch in chans]
            valid = jnp.maximum(valid, vs)

        out_ref[0] = _emit_formula(pos - d, chans[0], chans[1:],
                                   W, code_bits)


@functools.partial(jax.jit, static_argnames=("nrows", "nblk", "C", "W",
                                             "code_bits", "interpret"))
def expand_pallas(win, totals, nrows: int, nblk: int, C: int, W: int,
                  code_bits: int, interpret: bool = False):
    """win: (C, S*nblk + WBLK, 128) int32 channel-major record buffer
    (C = W + 2); totals: (S,) int32 per-slice total op count (ex-tail).
    Returns (S, nrows, 128) int32 op words."""
    S = totals.shape[0]
    assert nrows % CHUNK_ROWS == 0 and C == W + 2
    grid = (S, nrows // CHUNK_ROWS)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, CHUNK_ROWS, 128),
                               lambda s, c, *_: (s, c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((C, WBLK, 128), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((C,)),
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
    Returns (win (C, S*nblk + WBLK, 128), totals (S,), n_ops (S,), nblk,
    C) with C = W + 2 (channel-major: the kernel DMAs each chunk window
    as ONE strided copy; channel segments are already sublane-aligned).
    """
    from .device_coder import event_count
    i32 = jnp.int32
    S, npix = diff.shape
    hpad = int(svp.shape[1])
    W = len(words_n)
    C = W + 2
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
    win = jnp.stack([ch.reshape(S * nblk, 128) for ch in chans], axis=0)
    win = jnp.concatenate(
        [win, jnp.zeros((C, WBLK, 128), i32)
         .at[0].set(PAD_BASE)
         .at[1].set(1 << 30)], axis=1)
    return win, total, total + 3, nblk, C


def expand_ops_reference(words_n, diff, svp, btp, hlen, op_cap: int,
                         code_bits: int):
    """Pure-XLA reference of the expand kernel (CPU tests / dryrun):
    same op-word layout, computed with the emission grids."""
    from .device_coder import (emission_slots, event_count,
                               k_max_for_bits)
    from .device_coder import shift_compact
    i32 = jnp.int32
    S, npix = diff.shape
    hpad = int(svp.shape[1])
    k_max = k_max_for_bits(code_bits)
    slot, bit, valid = emission_slots(diff, k_max)
    # words_n are emission-order packed: op k reads byte k
    kg = jnp.arange(k_max, dtype=i32)[None, None, :]
    wsel, shf = kg >> 2, (kg & 3) * 8
    wsel = jnp.broadcast_to(wsel, slot.shape)
    shf = jnp.broadcast_to(shf, slot.shape)
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
