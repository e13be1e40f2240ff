"""Multi-operand bitonic sort on the TPU core (Pallas).

XLA's TPU sort is fast for BATCHED rows ((30, 128K) x 2 runs ~1.2 Gel/s)
but collapses on single long rows: the FFV1 device pipeline's cell unsort
((1, ~4M) x 9 operands) measures 20-30 Mel/s — every one of the ~250
bitonic sub-stages round-trips HBM.  This kernel runs the same network
with the chunk-local sub-stages VMEM-resident, as ONE pallas launch:

* grid = (phase, chunk); a *local* phase runs a span of the stage table
  (all sub-stages whose partners stay inside one VMEM chunk) with the
  chunk resident in scratch; a *cross* phase runs one global sub-stage
  (j >= chunk log2) as paired half-chunk block exchanges.
* the per-stage compare-exchange body is ONE compiled loop over a
  prefetched (k, j) stage table — `pltpu.roll` takes dynamic shifts, so
  the 100+ sub-stages share a single tiny kernel body (a fully unrolled
  network takes tens of minutes to compile through Mosaic).
* lane-level partners (j < 7) are two lane rolls + select; row-level
  partners are two sublane rolls.  Direction: ascending iff bit ``k+1``
  of the flat element index is 0 (one formula everywhere).

Results match ``jax.lax.sort(ops, num_keys, dimension=1)`` exactly
whenever each row's key tuple is duplicate-free (FFV1's keys are); among
duplicate keys the record order is unspecified (bitonic is not stable).

Why not radix/counting: the VPU has no cross-lane scatter, so any
data-dependent placement degenerates to log-shift passes of the same
order as the bitonic network; the bitonic formulation keeps every pass
a dense vector op.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _plt(pk, sk, num_keys):
    """partner <lex self (strict) for 1 or 2 int32 keys."""
    lt = pk[0] < sk[0]
    if num_keys == 2:
        lt = lt | ((pk[0] == sk[0]) & (pk[1] < sk[1]))
    return lt


def _exchange(arrs, num_keys, k, j, base, R):
    """One compare-exchange sub-stage on (R, 128) arrays.

    k, j, base: traced int32 scalars (base = flat index of element
    (0, 0); partners for j < log2(R*128) are all inside the block).
    Ascending iff bit k+1 of the flat element index is 0; roll semantics
    out[i] = in[i - s mod N], so the lower partner of an "up" element
    rides roll(+s) and the upper partner of a "down" element roll(N-s).
    """
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    g = base + ri * 128 + li
    up = ((g >> j) & 1) != 0
    asc = ((g >> (k + 1)) & 1) == 0
    want_small = up ^ asc

    def row_fn(arrs):
        s = 1 << (j - 7)
        return tuple(
            jnp.where(up, pltpu.roll(a, s, axis=0),
                      pltpu.roll(a, R - s, axis=0)) for a in arrs)

    def lane_fn(arrs):
        s = 1 << j
        return tuple(
            jnp.where(up, pltpu.roll(a, s, axis=1),
                      pltpu.roll(a, 128 - s, axis=1)) for a in arrs)

    partner = jax.lax.cond(j >= 7, row_fn, lane_fn, tuple(arrs))
    # (c & a) | (~c & b): jnp.where on bool operands lowers to an
    # i8->i1 truncation Mosaic rejects
    take = ((want_small & _plt(partner, arrs, num_keys))
            | (~want_small & _plt(arrs, partner, num_keys)))
    return [jnp.where(take, p, a) for p, a in zip(partner, arrs)]


# phase descriptor types
_LOCAL, _CROSS = 0, 1


def _sort_kernel(ph_ref, ks_ref, js_ref, *args,
                 num_keys, n_arrs, Rc, nrows):
    """grid = (n_phases, nchunks); operands are (nrows, 128) HBM refs
    aliased in == out.  LOCAL phase p runs stage-table span
    [ph[p,1], ph[p,2]) on chunk c; CROSS phase runs sub-stage
    (k=ph[p,1], j=ph[p,2]) on half-chunk pair c."""
    refs = args[:n_arrs]
    outs = args[n_arrs:2 * n_arrs]
    scr = args[2 * n_arrs]
    sems = args[2 * n_arrs + 1]
    p = pl.program_id(0)
    c = pl.program_id(1)
    typ = ph_ref[p, 0]
    a = ph_ref[p, 1]
    b = ph_ref[p, 2]

    # phase 0 reads the true inputs; every later phase reads the output
    # buffer it is incrementally overwriting (outs alias refs on HW, but
    # interpret mode does not honor the alias — reading outs is correct
    # in both worlds because phase 0 writes every row)
    def _read_rows(row0, nrows_blk):
        @pl.when(p == 0)
        def _():
            cps = [pltpu.make_async_copy(
                refs[i].at[pl.ds(row0, nrows_blk)],
                scr.at[i, pl.ds(0, nrows_blk)], sems.at[i])
                for i in range(n_arrs)]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

        @pl.when(p != 0)
        def _():
            cps = [pltpu.make_async_copy(
                outs[i].at[pl.ds(row0, nrows_blk)],
                scr.at[i, pl.ds(0, nrows_blk)], sems.at[i])
                for i in range(n_arrs)]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

    @pl.when(typ == _LOCAL)
    def _local():
        row0 = c * Rc
        _read_rows(row0, Rc)

        def body(s, arrs):
            return tuple(_exchange(arrs, num_keys, ks_ref[s], js_ref[s],
                                   row0 * 128, Rc))

        arrs = tuple(scr[i] for i in range(n_arrs))
        arrs = jax.lax.fori_loop(a, b, body, arrs)
        for i in range(n_arrs):
            scr[i] = arrs[i]
        cps = [pltpu.make_async_copy(
            scr.at[i], outs[i].at[pl.ds(row0, Rc)], sems.at[i])
            for i in range(n_arrs)]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    @pl.when(typ == _CROSS)
    def _cross():
        k, j = a, b
        Rh = Rc // 2
        half = Rh * 128
        jr = j - 7                    # j >= chunk log2 >= 7 always
        low0 = (c * half) >> j
        lower = low0 * (1 << (j + 1)) + ((c * half) & ((1 << j) - 1))
        lrow = lower // 128
        urow = lrow + (1 << jr)
        asc = ((low0 >> (k - j)) & 1) == 0

        cps = []
        for i in range(n_arrs):
            # cross phases always follow phase 0: read the out buffer
            cps.append(pltpu.make_async_copy(
                outs[i].at[pl.ds(lrow, Rh)], scr.at[i, pl.ds(0, Rh)],
                sems.at[i]))
            cps.append(pltpu.make_async_copy(
                outs[i].at[pl.ds(urow, Rh)], scr.at[i, pl.ds(Rh, Rh)],
                sems.at[i]))
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        lo = [scr[i, pl.ds(0, Rh)] for i in range(n_arrs)]
        hi = [scr[i, pl.ds(Rh, Rh)] for i in range(n_arrs)]
        swap = ((asc & _plt(hi, lo, num_keys))
                | (~asc & _plt(lo, hi, num_keys)))
        for i in range(n_arrs):
            n_lo = jnp.where(swap, hi[i], lo[i])
            n_hi = jnp.where(swap, lo[i], hi[i])
            scr[i, pl.ds(0, Rh)] = n_lo
            scr[i, pl.ds(Rh, Rh)] = n_hi
        cps = []
        for i in range(n_arrs):
            cps.append(pltpu.make_async_copy(
                scr.at[i, pl.ds(0, Rh)], outs[i].at[pl.ds(lrow, Rh)],
                sems.at[i]))
            cps.append(pltpu.make_async_copy(
                scr.at[i, pl.ds(Rh, Rh)], outs[i].at[pl.ds(urow, Rh)],
                sems.at[i]))
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()


def _plan(L, Lc):
    """Phase descriptors + stage table for sorting 2^L elements with
    2^Lc-element chunks.  Returns (phases (P,3) int32, ks, js)."""
    stages = []
    phases = []
    # phase 1: all merge stages whose partners stay inside one chunk
    s0 = len(stages)
    for k in range(Lc):
        for j in range(k, -1, -1):
            stages.append((k, j))
    phases.append((_LOCAL, s0, len(stages)))
    for k in range(Lc, L):
        for j in range(k, Lc - 1, -1):
            phases.append((_CROSS, k, j))
        s0 = len(stages)
        for j in range(Lc - 1, -1, -1):
            stages.append((k, j))
        phases.append((_LOCAL, s0, len(stages)))
    return (np.asarray(phases, np.int32),
            np.asarray([k for k, _ in stages], np.int32),
            np.asarray([j for _, j in stages], np.int32))


@functools.partial(jax.jit,
                   static_argnames=("num_keys", "chunk_log2", "interpret"))
def _sort_flat(operands, num_keys, chunk_log2, interpret):
    M = operands[0].shape[1]
    L = M.bit_length() - 1
    Lc = min(chunk_log2, L)
    C = 1 << Lc
    Rc = C // 128
    n = len(operands)
    nchunks = M // C
    phases, ks, js = _plan(L, Lc)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(len(phases), nchunks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * n),
        scratch_shapes=[
            pltpu.VMEM((n, Rc, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((n,)),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_sort_kernel, num_keys=num_keys, n_arrs=n,
                          Rc=Rc, nrows=M // 128),
        grid_spec=grid_spec,
        out_shape=tuple([jax.ShapeDtypeStruct((M // 128, 128), jnp.int32)]
                        * n),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(jnp.asarray(phases), jnp.asarray(ks), jnp.asarray(js),
      *[o.reshape(M // 128, 128) for o in operands])
    return tuple(o.reshape(1, M) for o in outs)


def _rowsort_kernel(ks_ref, js_ref, *args, num_keys, n_arrs, R):
    """grid = (B,): whole row resident in VMEM, full stage table."""
    refs = args[:n_arrs]
    outs = args[n_arrs:2 * n_arrs]

    def body(s, arrs):
        return tuple(_exchange(arrs, num_keys, ks_ref[s], js_ref[s],
                               0, R))

    arrs = tuple(refs[i][0] for i in range(n_arrs))
    arrs = jax.lax.fori_loop(0, ks_ref.shape[0], body, arrs)
    for i in range(n_arrs):
        outs[i][0] = arrs[i]


@functools.partial(jax.jit, static_argnames=("num_keys", "interpret"))
def _sort_vmem(operands, num_keys, interpret):
    B, M = operands[0].shape
    R = M // 128
    L = M.bit_length() - 1
    n = len(operands)
    _, ks, js = _plan(L, L)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, R, 128), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM)] * n,
        out_specs=tuple([pl.BlockSpec((1, R, 128), lambda b, *_: (b, 0, 0),
                                      memory_space=pltpu.VMEM)] * n),
    )
    outs = pl.pallas_call(
        functools.partial(_rowsort_kernel, num_keys=num_keys, n_arrs=n,
                          R=R),
        grid_spec=grid_spec,
        out_shape=tuple([jax.ShapeDtypeStruct((B, R, 128), jnp.int32)]
                        * n),
        interpret=interpret,
    )(jnp.asarray(ks), jnp.asarray(js),
      *[o.reshape(B, R, 128) for o in operands])
    return tuple(o.reshape(B, M) for o in outs)


def sort_rows_pallas(operands, num_keys: int = 1,
                     interpret: bool = False,
                     chunk_log2: int = 17,
                     vmem_budget: int = 10 << 20):
    """Sort each row of the int32 ``operands`` ascending by the first
    ``num_keys`` operands (lexicographic).  All operands are (B, M) with
    M a power of two and a multiple of 1024.  Matches
    ``jax.lax.sort(operands, num_keys=num_keys, dimension=1)`` when each
    row's key tuple has no duplicates; duplicate-key record order is
    unspecified.  Pad with key = INT32_MAX to sort a shorter prefix.
    """
    B, M = operands[0].shape
    assert M & (M - 1) == 0 and M >= 1024, "M must be a power of two >= 1024"
    assert num_keys in (1, 2)
    n = len(operands)
    if B > 1 or n * M * 4 <= vmem_budget:
        return _sort_vmem(tuple(operands), num_keys, interpret)
    # the stage loop holds ~4 live copies of the chunk (carry, partner,
    # cond operands, scratch) — budget accordingly or Mosaic's scoped
    # vmem stack OOMs at 16M
    while (4 * n + 2) * (1 << chunk_log2) * 4 > vmem_budget:
        chunk_log2 -= 1
    # floor: cross phases need half-chunks of >= 1 row (256 elements)
    chunk_log2 = max(min(chunk_log2, M.bit_length() - 1), 8)
    return _sort_flat(tuple(operands), num_keys, chunk_log2, interpret)
