"""Pallas sorted-placement: scatter with pre-sorted unique destinations.

XLA's generic scatter runs ~6 ms per million elements on this chip (HBM
random access, tools/microbench_scatter.py); a scatter whose
destinations are KNOWN AND SORTED needs none of that.  After one
``lax.sort`` by destination the placement becomes a streaming monotone
distribute — the same collision-free log-shift the op-stream expand
kernel uses (ffv1/expand_pallas.py), minus the segmented fill:

* grid = output chunks of 4096 slots, walked sequentially; an SMEM
  pointer carries the index of the last element with dest <= the
  chunk's first slot (elements with dest >= the chunk end wait for a
  later chunk);
* each chunk DMAs a 34-block element window per channel, aligns it with
  one dynamic lane roll per channel, and log-shifts every element to
  slot ``dest - chunk_base`` (dests strictly increase with the element
  index, so all intermediate positions stay distinct);
* a slot emits its element iff the landed dest matches exactly;
  missed slots (gaps) emit per-channel fill values.

Sentinel elements (dest = int32 max, e.g. dropped entries) sort to the
tail and never place.  Cost: the sort (~3 ms per million-operand) plus
~0.7 ns/slot for the distribute — vs ~6 ms/M for XLA scatter.

Replaces ffv1/device_coder.scatter_cells' two 3.1M-element scatters
(the reference encoder has no analogue — this layout feeds the
slices-as-lanes adaptation; see ffv1enc.c:270-340 for the serial form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK_ROWS = 32              # output rows per grid step
CHUNK = CHUNK_ROWS * 128
WBLK = CHUNK_ROWS + 2        # element window blocks (see expand_pallas)


def _shift_fwd(x, k: int):
    """Flat-order forward shift on an (R, 128) tile; zero fill."""
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


def _place_kernel(win_hbm, out_ref, scr, ptr_ref, sem,
                  *, nch: int, fills: tuple):
    c = pl.program_id(0)
    j0c = c * CHUNK

    @pl.when(c == 0)
    def _reset():
        ptr_ref[0] = 0

    ptr0 = ptr_ref[0]                 # last element with dest <= j0c
    pb = ptr0 >> 7
    cps = [pltpu.make_async_copy(
        win_hbm.at[ch, pl.ds(pb, WBLK)], scr.at[ch], sem.at[ch])
        for ch in range(1 + nch)]
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
    chans = [align(1 + i)[:R] for i in range(nch)]
    pos = q
    for b in range(11, -1, -1):
        k = 1 << b
        mv = valid & (jnp.maximum(d - pos, 0) >> b) & 1
        mvs = _shift_fwd(mv, k)
        d = jnp.where(mvs == 1, _shift_fwd(d, k), d)
        chans = [jnp.where(mvs == 1, _shift_fwd(ch, k), ch)
                 for ch in chans]
        valid = jnp.where(mvs == 1, 1, valid * (1 - mv))

    hit = (valid == 1) & (d == pos)
    for i in range(nch):
        out_ref[i] = jnp.where(hit, chans[i],
                               jnp.full((R, 128), fills[i], jnp.int32))


@functools.partial(jax.jit, static_argnames=("nrows", "fills",
                                             "interpret"))
def place_sorted_pallas(dest, chans, nrows: int, fills: tuple,
                        interpret: bool = False):
    """Place chans[i][k] at flat slot dest[k] of an (nrows, 128) buffer.

    dest: (N,) int32, sorted ascending; real dests unique and
    < nrows*128; sentinel entries (int32 max) sort last and are
    dropped.  chans: tuple of (N,) int32 payloads; fills: per-channel
    value for empty slots.  Returns len(chans) arrays (nrows, 128).
    """
    nch = len(chans)
    assert len(fills) == nch and nrows % CHUNK_ROWS == 0
    N = dest.shape[0]
    nblk = -(-N // 128) + WBLK
    pad = nblk * 128 - N
    drop = jnp.iinfo(jnp.int32).max

    def padded(a, fill):
        return jnp.concatenate(
            [a, jnp.full((pad,), fill, jnp.int32)]).reshape(nblk, 128)

    win = jnp.stack([padded(dest, drop)]
                    + [padded(ch, 0) for ch in chans], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nrows // CHUNK_ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((nch, CHUNK_ROWS, 128),
                               lambda c: (0, c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1 + nch, WBLK, 128), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((1 + nch,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_place_kernel, nch=nch,
                          fills=tuple(int(f) for f in fills)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nch, nrows, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(win)
    return tuple(out[i] for i in range(nch))
