"""Device-side pixel format conversions (jitted ports of yuv_rgb.py).

SURVEY §7 step 5 asks for the swscale-equivalent conversions "fused into
the encode graph (HBM -> bitstream, no host round-trip)": these are the
jnp versions of the byte-exact models in yuv_rgb.py, jittable and
composable with FFV1 phase A (see fused_bgr0_phase_a below for the fused
convert+model entry).  Bit-identity with the numpy models is pinned by
tests/test_convert_tpu.py; the numpy models themselves are pinned against
the reference swscale binary (tests/test_convert_parity.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import yuv_rgb as _host


def _z(name):
    return _host._load(name)


def _upsample2(c, h, w):
    cc = jnp.repeat(jnp.repeat(c, 2, 0), 2, 1)
    return cc[:h, :w]


@jax.jit
def yuv420p_to_bgr0(y, u, v):
    z = _z("yuv2rgb_bgr0.npz")
    ext = jnp.asarray(z["ext"], jnp.int32)
    du = jnp.asarray(z["du"], jnp.int32)
    dv = jnp.asarray(z["dv"], jnp.int32)
    rtab = jnp.asarray(z["rtab"], jnp.int32)
    btab = jnp.asarray(z["btab"], jnp.int32)
    D = int(z["D"])
    y = jnp.asarray(y, jnp.int32)
    h, w = y.shape
    uu = _upsample2(jnp.asarray(u, jnp.int32), h, w)
    vv = _upsample2(jnp.asarray(v, jnp.int32), h, w)
    B = btab[uu, y]
    R = rtab[vv, y]
    G = ext[D + du[uu] + dv[vv] + y]
    A = jnp.full_like(B, 255)
    return jnp.stack([B, G, R, A], -1).astype(jnp.uint8)


@jax.jit
def yuv420p_to_rgb48(y, u, v):
    y = jnp.asarray(y, jnp.int32)
    h, w = y.shape
    uu = _upsample2(jnp.asarray(u, jnp.int32), h, w)
    vv = _upsample2(jnp.asarray(v, jnp.int32), h, w)
    # int32 wraparound == the numpy model's _w32
    Y1 = ((y << 9) - _host._YO) * _host._YC + (1 << 13)
    U = (uu - 128) << 9
    V = (vv - 128) << 9

    def clip(x):
        return jnp.clip(x, 0, (1 << 30) - 1) >> 14

    out = jnp.stack([clip(V * _host._V2R + Y1),
                     clip(V * _host._V2G + U * _host._U2G + Y1),
                     clip(U * _host._U2B + Y1)], -1)
    return out.astype(jnp.uint16)


@jax.jit
def bgr0_to_yuv420p(img):
    z = _z("rgb2yuv_bgr0.npz")
    (Ay, By, Cy, Ey) = (int(t) for t in z["y"])
    (Au, Bu, Cu, Eu) = (int(t) for t in z["u"])
    (Av, Bv, Cv, Ev) = (int(t) for t in z["v"])
    SH = int(z["shift"])
    img = jnp.asarray(img, jnp.int32)
    r, g, b = img[..., 2], img[..., 1], img[..., 0]
    y8 = (Ay * r + By * g + Cy * b + Ey) >> SH
    ro, go, bo = r[1::2], g[1::2], b[1::2]
    rs = ro[:, 0::2] + ro[:, 1::2]
    gs = go[:, 0::2] + go[:, 1::2]
    bs = bo[:, 0::2] + bo[:, 1::2]
    u8 = (Au * rs + Bu * gs + Cu * bs + Eu) >> (SH + 1)
    v8 = (Av * rs + Bv * gs + Cv * bs + Ev) >> (SH + 1)
    return (y8.astype(jnp.uint8), u8.astype(jnp.uint8),
            v8.astype(jnp.uint8))


def _dither_matrix(E):
    # all accumulators fit int32 (max |sum| < 2^31; the reference C is int32)
    return jnp.asarray(E, jnp.int32)


@jax.jit
def rgb48_to_yuv420p(img):
    z = _z("rgb2yuv_rgb48.npz")
    (SHy, Ay, By, Cy) = (int(t) for t in z["y"])
    (SHu, Au, Bu, Cu) = (int(t) for t in z["u"])
    (SHv, Av, Bv, Cv) = (int(t) for t in z["v"])
    yE = _dither_matrix(z["yE"])
    uE = _dither_matrix(z["uE"])
    vE = _dither_matrix(z["vE"])
    img = jnp.asarray(img, jnp.int32)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    h, w = r.shape
    iy = jnp.arange(h) % 8
    ix = jnp.arange(w) % 8
    y8 = (Ay * r + By * g + Cy * b + yE[iy][:, ix]) >> SHy
    ro, go, bo = r[1::2], g[1::2], b[1::2]
    rh = (ro[:, 0::2] + ro[:, 1::2] + 1) >> 1
    gh = (go[:, 0::2] + go[:, 1::2] + 1) >> 1
    bh = (bo[:, 0::2] + bo[:, 1::2] + 1) >> 1
    hc, wc = rh.shape
    jy = jnp.arange(hc) % 8
    jx = jnp.arange(wc) % 8
    u8 = (Au * rh + Bu * gh + Cu * bh + uE[jy][:, jx]) >> SHu
    v8 = (Av * rh + Bv * gh + Cv * bh + vE[jy][:, jx]) >> SHv
    return (y8.astype(jnp.uint8), u8.astype(jnp.uint8),
            v8.astype(jnp.uint8))


@jax.jit
def gbrp16_to_yuv420p(g, b, r):
    z = _z("rgb2yuv_gbrp16.npz")
    (SHy, Ay, By, Cy) = (int(t) for t in z["y"])
    (SHu, Au, Bu, Cu) = (int(t) for t in z["u"])
    (SHv, Av, Bv, Cv) = (int(t) for t in z["v"])
    yE = _dither_matrix(z["yE"])
    uE = _dither_matrix(z["uE"])
    vE = _dither_matrix(z["vE"])
    r = jnp.asarray(r, jnp.int32)
    g = jnp.asarray(g, jnp.int32)
    b = jnp.asarray(b, jnp.int32)
    h, w = r.shape
    iy = jnp.arange(h) % 8
    ix = jnp.arange(w) % 8
    y8 = (Ay * r + By * g + Cy * b + yE[iy][:, ix]) >> SHy
    rs, gs, bs = r[1::2, 1::2], g[1::2, 1::2], b[1::2, 1::2]
    hc, wc = rs.shape
    jy = jnp.arange(hc) % 8
    jx = jnp.arange(wc) % 8
    u8 = (Au * rs + Bu * gs + Cu * bs + uE[jy][:, jx]) >> SHu
    v8 = (Av * rs + Bv * gs + Cv * bs + vE[jy][:, jx]) >> SHv
    return (y8.astype(jnp.uint8), u8.astype(jnp.uint8),
            v8.astype(jnp.uint8))


@functools.partial(jax.jit, static_argnames=("bits", "five"))
def fused_bgr0_phase_a(img, qt, bits, five):
    """HBM -> model in one XLA program: packed bgr0 frame -> yuv420p ->
    FFV1 phase A (context, folded diff) per plane.  The conversion output
    never round-trips to the host (SURVEY §7 step 5)."""
    from ..ffv1.tpu import plane_context_diff, _wrap16
    y, u, v = bgr0_to_yuv420p(img)
    outs = []
    for pl in (y, u, v):
        s = _wrap16(pl.astype(jnp.int32))
        outs.append(plane_context_diff(s, qt, bits, five))
    return outs
