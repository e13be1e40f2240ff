"""Pyramid vector quantization for FFV2 bands.

The shape search replaces the reference's AVX assembly
(libavcodec/x86/celt_pvq_search.asm, the encoder's only asm dependency,
ffv2enc.c:171) with an exact integer greedy search: place K pulses one at a
time at the position maximizing corr^2/energy, compared with exact int64
cross-multiplication — deterministic on every backend and vectorizable.

Gain coding uses integer companding: the reference computes
pow(gain, 1/1.5)=gain^(2/3) in floats (ffv2enc.c:gain_compand) and
pow(cg, 1.5) with a float 1/sqrt(cnt) renormalization on decode
(ffv2dec.c:gain_expand/dequant_block) — libm-dependent and not
reproducible across platforms.  We rationalize both sides to exact integer
roots (SURVEY.md section 7 step 7):
    encode:  cg    = floor(cbrt(sum x^2))              # == gain^(2/3)
    decode:  coeff = sign(p) * floor(sqrt(p^2 * cg^3 / sum p^2))
"""

from __future__ import annotations

import math

import numpy as np


def isqrt(v: int) -> int:
    return math.isqrt(int(v))


def icbrt(v: int) -> int:
    v = int(v)
    if v <= 0:
        return 0
    r = round(v ** (1 / 3))
    while r * r * r > v:
        r -= 1
    while (r + 1) ** 3 <= v:
        r += 1
    return r


def pvq_search(x: np.ndarray, k: int, max_abs: int | None = None
               ) -> np.ndarray:
    """Greedy PVQ: y in Z^n with sum|y| == k maximizing (x.y)^2 / (y.y).

    The search is an encoder-side *choice* — the decoder never re-runs it —
    so it only needs to be deterministic for the encoding run, not
    bit-reproducible across platforms.  Vectorized one-pulse-at-a-time
    argmax (k iterations of VPU-friendly elementwise work).

    ``max_abs`` caps each |y_i|.  The wire format codes |y_i| with a
    qp-ary CDF (ffv2enc.c:181, alphabet size == qp), so |y_i| == qp is not
    representable; the reference's float search can still produce it (an
    out-of-bounds CDF write in the reference encoder).  We cap at qp-1
    instead, staying reference-decodable."""
    ax = np.abs(x.astype(np.int64))
    y = np.zeros(len(x), dtype=np.int64)
    if k <= 0 or not ax.any():
        return y
    xy = 0
    yy = 0
    for _ in range(k):
        nxy = (xy + ax).astype(np.float64)
        nyy = (yy + 2 * y + 1).astype(np.float64)
        score = nxy * nxy / nyy
        if max_abs is not None:
            score[y >= max_abs] = -1.0
            if not (score >= 0).any():
                break
        j = int(np.argmax(score))
        y[j] += 1
        xy += int(ax[j])
        yy += 2 * int(y[j]) - 1
    return y * np.sign(x.astype(np.int64))


def band_reconstruct(pulses: np.ndarray, cg: int) -> np.ndarray:
    """Integer-exact band reconstruction shared by encoder model and
    decoder: coeff_j = sign(p_j) * floor(sqrt(p_j^2 * cg^3 / sum p^2))."""
    p = pulses.astype(np.int64)
    cnt = int(np.sum(p * p))
    if cnt == 0 or cg == 0:
        return np.zeros_like(p)
    c3 = int(cg) ** 3
    out = np.array([isqrt((int(v) * int(v) * c3) // cnt) for v in p],
                   dtype=np.int64)
    return out * np.sign(p)
