"""Hybrid TPU FFV1 encoder: phase A (context modeling) on the TPU, phase B
(adaptive entropy coding) in the slice-threaded C++ host runtime.

Slices are independent coding units — the sample ring resets at slice
borders (ffv1enc.c:282) — so phase A runs per slice crop.  Same-shaped
slice crops are stacked and processed in one vmapped jit call, which is
also the unit that shards across devices (parallel/slices.py).

Produces packets byte-identical to the pure host encoder (tested in
tests/test_tpu_phase_a.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .params import FFV1Params, FFV1Config, params_from_config, CODER_GOLOMB
from .native import NativeFFV1Codec
from .tpu import plane_context_diff, _wrap16, lut_for
from . import headers as H


@functools.partial(jax.jit, static_argnames=("bits", "five"))
def _phase_a_batch(crops, qt, bits, five):
    """crops: int32 [n, h, w] (already wrapped) -> (ctx, diff) each [n,h,w].

    Outputs are narrowed to int16 on device (ctx < 32768 by the format's
    context-count cap; |diff| < 2^15 for bits <= 16) — the device->host
    link is the bottleneck of the hybrid pipeline, so halve the bytes."""
    fn = functools.partial(plane_context_diff, qt=qt, bits=bits, five=five)
    ctx, diff = jax.vmap(lambda s: fn(s))(crops)
    return ctx.astype(jnp.int16), diff.astype(jnp.int16)


def ceil_rshift(v, s):
    return -(-v >> s) if s else v


class TPUFFV1Encoder:
    """Encoder session; TPU for modeling, native host runtime for coding."""

    def __init__(self, width: int, height: int, pix_fmt: str,
                 config: FFV1Config | None = None, n_threads: int = 0):
        self.cfg = config or FFV1Config()
        self.p = params_from_config(self.cfg, pix_fmt, width, height)
        if self.p.colorspace != 0:
            raise NotImplementedError(
                "TPU phase-A currently covers YUV/gray; RGB uses the host "
                "path (NativeFFV1Codec)")
        self.native = NativeFFV1Codec(self.p, n_threads)
        self.extradata = (H.write_extradata(self.p)
                          if self.p.version > 1 else b"")
        self.picture_number = 0
        p = self.p
        self.qt = lut_for(p, p.context_model)
        self.five = bool(p.quant_tables[p.context_model][3][127]
                         or p.quant_tables[p.context_model][4][127])
        self._plan = self._build_plan()

    # -- slice crop planning ------------------------------------------------

    def _build_plan(self):
        """Per coded plane: list of (slice rect in plane resolution)."""
        p = self.p
        plan = []
        plane_dims = [(p.width, p.height, 0, 0)]
        if p.chroma_planes:
            hs, vs = p.chroma_h_shift, p.chroma_v_shift
            cw, ch = ceil_rshift(p.width, hs), ceil_rshift(p.height, vs)
            plane_dims += [(cw, ch, hs, vs)] * 2
        if p.transparency:
            plane_dims.append((p.width, p.height, 0, 0))
        rects = p.rects()
        for (pw, ph, hs, vs) in plane_dims:
            prects = []
            for (x, y, w, h) in rects:
                px, py = x >> hs, y >> vs
                pw2, ph2 = ceil_rshift(w, hs), ceil_rshift(h, vs)
                prects.append((px, py, pw2, ph2))
            plan.append(prects)
        return plan

    def phase_a(self, planes):
        """Run TPU phase A.

        Returns (ctx, diff) crop arrays indexed [slice * n_planes + plane].
        Crops are per slice because chroma slices of odd-sized frames
        overlap by a row/column (each slice codes its ceil-rounded chroma
        rect independently) — a full-frame array cannot hold both.
        """
        p = self.p
        n_slices = p.slice_count
        n_planes = len(self._plan)
        ctx_streams = [None] * (n_slices * n_planes)
        diff_streams = [None] * (n_slices * n_planes)
        for li, prects in enumerate(self._plan):
            plane = np.asarray(planes[li])
            # group slices by crop shape -> one batched call per shape
            groups = {}
            for si, (x, y, w, h) in enumerate(prects):
                groups.setdefault((h, w), []).append(si)
            for (h, w), sis in groups.items():
                crops = np.stack([
                    plane[prects[si][1]:prects[si][1] + h,
                          prects[si][0]:prects[si][0] + w]
                    for si in sis]).astype(np.int32)
                crops = np.asarray(_wrap16(crops), dtype=np.int32)
                ctx, diff = _phase_a_batch(jnp.asarray(crops), self.qt,
                                           p.bits, self.five)
                ctx = np.asarray(ctx)
                diff = np.asarray(diff)
                for k, si in enumerate(sis):
                    ctx_streams[si * n_planes + li] = ctx[k]
                    diff_streams[si * n_planes + li] = diff[k]
        return ctx_streams, diff_streams

    # -- public API ---------------------------------------------------------

    def encode(self, planes, force_keyframe=None) -> bytes:
        gop = self.cfg.gop_size
        keyframe = (gop == 0 or self.picture_number % gop == 0)
        if force_keyframe is not None:
            keyframe = bool(force_keyframe)
        ctx_streams, diff_streams = self.phase_a(planes)
        pkt = self.native.encode_sym(planes, ctx_streams, diff_streams,
                                     keyframe)
        self.picture_number += 1
        return pkt
