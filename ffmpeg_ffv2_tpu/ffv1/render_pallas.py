"""Pallas packet rendering: staged coder emissions -> packet bytes.

Replaces render_bytes_fast's XLA log-shift chain (two shift_compact_packed
passes over the (S, steps) staged domain + one shift_expand over the byte
domain — ~20 masked passes each, ~13 ms at 1080p) with two streaming
kernels built from the same monotone-distribute primitives as
ops/place_pallas.py and ffv1/expand_pallas.py:

1. ``compact_staged_pallas``: per 4096-step input chunk, an in-VMEM
   prefix-sum ranks the emitting steps and a 12-pass backward log-shift
   compacts them; the dense chunk is spliced into the output at the
   carried write position (one dynamic lane roll + a carried partial
   row, full rows written with an async copy at a dynamic row offset —
   sequential grid order makes the overlapping tail rows self-healing).
2. ``place_bytes_pallas``: events (dest = byte offset, strictly
   increasing; payload = first byte | fill value) stream through the
   sorted-placement walk; a 10-pass forward fill propagates each
   event's fill value across its run (fcount <= 1023 — the caller's
   existing render_bytes fallback covers longer runs).

Semantics match device_coder.render_bytes_fast bit for bit: each
emitting step appends its first byte then fcount copies of fval
(compact_lane semantics; the staged layout mirrors rangecoder.c's
renorm byte+carry-run output, rangecoder.c:104-121).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.place_pallas import _shift_fwd

CHUNK_ROWS = 32
CHUNK = CHUNK_ROWS * 128
WBLK = CHUNK_ROWS + 2


def _shift_bwd(x, k: int):
    """Flat-order backward shift on an (R, 128) tile; zero fill."""
    R = x.shape[0]
    kr, kl = k // 128, k % 128
    z = jnp.zeros((1, 128), x.dtype)

    def rows_up(t, m):
        if m == 0:
            return t
        return jnp.concatenate(
            [t[m:], jnp.broadcast_to(z, (m, 128))], axis=0)

    if kl == 0:
        return rows_up(x, kr)
    r = pltpu.roll(x, 128 - kl, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    return jnp.where(lane < 128 - kl, rows_up(r, kr), rows_up(r, kr + 1))


def _compact_kernel(w_ref, out_hbm, scr, carry, base_ref, sem,
                    *, rows: int, ev_rows: int):
    s = pl.program_id(0)
    c = pl.program_id(1)
    R = rows

    @pl.when(c == 0)
    def _reset():
        base_ref[0] = 0
        carry[...] = jnp.zeros((1, 128), jnp.int32)

    w = w_ref[0]
    emit = (w >> 9) & 1
    # exclusive prefix sum of emit over the flat (R, 128) chunk
    inc = emit
    for b in range(R.bit_length() + 6):
        inc = inc + _shift_fwd(inc, 1 << b)
        if (2 << b) >= R * 128:
            break
    rank = inc - emit                      # exclusive cumsum
    n_c = jnp.max(inc)
    pos = (jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1))
    # backward monotone log-shift: element at pos -> rank.  Backward
    # (left) moves must process delta bits LOW to HIGH — the mirror of
    # the forward distribute's high-to-low order (see shift_compact)
    d = jnp.where(emit == 1, pos - rank, 0)
    x = jnp.where(emit == 1, w, 0)
    valid = emit
    for b in range(R.bit_length() + 7):
        if (1 << b) >= R * 128:
            continue
        k = 1 << b
        mv = valid & ((d >> b) & 1)
        mvs = _shift_bwd(mv, k)
        x = jnp.where(mvs == 1, _shift_bwd(x, k), x)
        d = jnp.where(mvs == 1, _shift_bwd(d, k) - k, d)
        valid = jnp.where(mvs == 1, 1, valid * (1 - mv))

    # splice at the carried flat write position: shift forward by
    # (base & 127) lanes, merge the carried partial row, write full
    # rows at base >> 7 (the trailing partial row is rewritten -- and
    # thereby completed -- by the next chunk)
    base = base_ref[0]
    a = base & 127
    rolled = pltpu.roll(x, a, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R + 1, 128), 1)
    up = jnp.concatenate([rolled, jnp.zeros((1, 128), jnp.int32)], axis=0)
    dn = jnp.concatenate([jnp.zeros((1, 128), jnp.int32), rolled], axis=0)
    shifted = jnp.where(lane >= a, up, dn)
    row0 = jnp.where(lane[0:1] < a, carry[...], shifted[0:1])
    # scr carries R+8 rows: the DMA engine requires the copied sublane
    # count to be a multiple of 8 (a 33-row VMEM->HBM copy hard-faults
    # the chip -- measured, any offset); the 7 pad rows land beyond the
    # spliced tail and every row inside the final valid prefix is
    # rewritten by a later chunk's valid window (rows advance <= R per
    # chunk, so valid windows tile without holes)
    scr[...] = jnp.concatenate(
        [row0, shifted[1:], jnp.zeros((7, 128), jnp.int32)], axis=0)
    out_rows = jnp.minimum(base >> 7, ev_rows - (R + 8))
    cp = pltpu.make_async_copy(
        scr, out_hbm.at[s, pl.ds(out_rows, R + 8)], sem)
    cp.start()
    nbase = base + n_c
    # new carry = the partial row at nbase >> 7 (content written above)
    crow = (nbase >> 7) - (base >> 7)
    carry[...] = scr[pl.ds(crow, 1)]
    base_ref[0] = nbase
    cp.wait()


@functools.partial(jax.jit, static_argnames=("rows", "ev_rows",
                                             "interpret"))
def compact_staged_pallas(w, rows: int, ev_rows: int,
                          interpret: bool = False):
    """w: (S, srows, 128) staged words ((fcount<<10)|(1<<9)|(fval&1)<<8|
    first for emitting steps, 0 otherwise).  Returns (S, ev_rows, 128)
    with each slice's emitting words compacted to a dense prefix
    (tail rows undefined — mask with the event counts)."""
    S, srows, _ = w.shape
    assert srows % rows == 0 and ev_rows >= srows + rows + 8
    grid = (S, srows // rows)
    out = pl.pallas_call(
        functools.partial(_compact_kernel, rows=rows, ev_rows=ev_rows),
        grid=grid,
        in_specs=[pl.BlockSpec((1, rows, 128), lambda s, c: (s, c, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((S, ev_rows, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((rows + 8, 128), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(w)
    return out


def _place_bytes_kernel(tot_ref, win_hbm, out_ref, scr, ptr_ref, sem,
                        *, nblk: int):
    s = pl.program_id(0)
    c = pl.program_id(1)
    j0c = c * CHUNK
    total = tot_ref[s]

    @pl.when(c == 0)
    def _reset():
        ptr_ref[0] = 0

    @pl.when(j0c >= total)
    def _skip():
        out_ref[0] = jnp.zeros((CHUNK_ROWS, 128), jnp.int32)

    @pl.when(j0c < total)
    def _chunk():
        ptr0 = ptr_ref[0]
        # clamp: on an overflowed op stream (opmax > op_cap, caught by
        # the caller's size check AFTER this optimistic render) the
        # event window may carry garbage offsets; an unclamped ptr
        # would DMA past win_hbm and wedge the whole device.  Valid
        # streams never reach the clamp (ptr/128 <= ev_rows < nblk).
        pb = jnp.minimum(ptr0 >> 7, nblk)
        cps = [pltpu.make_async_copy(
            win_hbm.at[ch, pl.ds(s * nblk + pb, WBLK)],
            scr.at[ch], sem.at[ch]) for ch in range(2)]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        rel = ptr0 - pb * 128
        sh = (128 - rel) & 127
        lane33 = jax.lax.broadcasted_iota(jnp.int32, (WBLK - 1, 128), 1)

        def align(ch):
            r = pltpu.roll(scr[ch], sh, axis=1)
            return jnp.where(lane33 < 128 - rel, r[:WBLK - 1], r[1:WBLK])

        adest = align(0)
        q33 = (jax.lax.broadcasted_iota(
            jnp.int32, (WBLK - 1, 128), 0) * 128 + lane33)
        ptr_ref[0] = ptr0 + jnp.sum(
            ((adest <= j0c + CHUNK) & (q33 >= 1)).astype(jnp.int32))

        R = CHUNK_ROWS
        q = q33[:R]
        d = adest[:R] - j0c
        valid = ((d < CHUNK) & ((q == 0) | (d >= 1))).astype(jnp.int32)
        ww = align(1)[:R]
        pos = q
        for b in range(11, -1, -1):
            k = 1 << b
            mv = valid & (jnp.maximum(d - pos, 0) >> b) & 1
            mvs = _shift_fwd(mv, k)
            d = jnp.where(mvs == 1, _shift_fwd(d, k), d)
            ww = jnp.where(mvs == 1, _shift_fwd(ww, k), ww)
            valid = jnp.where(mvs == 1, 1, valid * (1 - mv))
        # forward fill across each event's run (gap <= fcount <= 1023)
        for st in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512):
            vs = _shift_fwd(valid, st)
            take = (1 - valid) * vs
            d = jnp.where(take == 1, _shift_fwd(d, st), d)
            ww = jnp.where(take == 1, _shift_fwd(ww, st), ww)
            valid = jnp.maximum(valid, vs)

        k = pos - d
        fc = (ww >> 10) & 0x3FF
        byte = jnp.where(k == 0, ww & 0xFF,
                         jnp.where(k <= fc, ((ww >> 8) & 1) * 0xFF, 0))
        out_ref[0] = jnp.where(pos + j0c < total, byte, 0)


@functools.partial(jax.jit, static_argnames=("nrows", "nblk",
                                             "interpret"))
def place_bytes_pallas(win, totals, nrows: int, nblk: int,
                       interpret: bool = False):
    """win: (2, S*nblk + WBLK, 128) channel-major event buffer
    (channel 0 = byte offsets, strictly increasing, int32-max padded;
    channel 1 = staged words); totals: (S,) byte counts.  Returns
    (S, nrows, 128) int32 bytes."""
    S = totals.shape[0]
    assert nrows % CHUNK_ROWS == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, nrows // CHUNK_ROWS),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, CHUNK_ROWS, 128),
                               lambda s, c, *_: (s, c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, WBLK, 128), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_place_bytes_kernel, nblk=nblk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, nrows, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(totals, win)


@functools.partial(jax.jit, static_argnames=("buf_cap", "interpret"))
def render_bytes_pallas(first, fcount, fval, buf_cap: int,
                        interpret: bool = False):
    """Drop-in twin of render_bytes_fast (same outputs/gates) built on
    the two streaming kernels.  first/fcount/fval: (S, steps) int32;
    returns (bytes uint8 (S, buf_cap), lengths (S,), fc_max)."""
    i32 = jnp.int32
    S, steps = first.shape
    emit = first >= 0
    fcmax = jnp.max(jnp.where(emit, fcount, 0))
    w = jnp.where(emit, (jnp.minimum(fcount, 1023) << 10) | (1 << 9)
                  | ((fval & 1) << 8) | (first & 0xFF), 0)

    rows = min(CHUNK_ROWS, steps // 128)
    ev_rows = steps // 128 + rows + 8
    dense = compact_staged_pallas(w.reshape(S, steps // 128, 128),
                                  rows, ev_rows, interpret=interpret)
    dense = dense.reshape(S, ev_rows * 128)
    counts = jnp.sum(emit.astype(i32), axis=1)
    pos = jnp.arange(ev_rows * 128, dtype=i32)[None, :]
    live = pos < counts[:, None]
    dense = jnp.where(live, dense, 0)
    fc = (dense >> 10) & 0x3FF
    nbytes = jnp.where(live, 1 + fc, 0)
    endo = jnp.cumsum(nbytes, axis=1)
    total = endo[:, -1]
    off = jnp.where(live, endo - nbytes, jnp.iinfo(i32).max)

    # event window (channel-major, like expand/place)
    nblk = ev_rows + WBLK
    pad = nblk * 128 - ev_rows * 128

    def padded(a, fill):
        return jnp.concatenate(
            [a, jnp.full((S, pad), fill, i32)], axis=1).reshape(
            S * nblk, 128)

    win = jnp.stack([padded(off, jnp.iinfo(i32).max), padded(dense, 0)],
                    axis=0)
    win = jnp.concatenate(
        [win, jnp.zeros((2, WBLK, 128), i32)
         .at[0].set(jnp.iinfo(i32).max)], axis=1)

    nrows = -(-buf_cap // CHUNK) * CHUNK // 128
    by = place_bytes_pallas(win, total, nrows, nblk,
                            interpret=interpret)
    by = by.reshape(S, nrows * 128)[:, :buf_cap]
    return by.astype(jnp.uint8), total, fcmax
