"""Bit-exact JS math: vectorized fdlibm sin/log.

JavaScript engines (V8's base/ieee754.cc) use the public Sun fdlibm
algorithms for Math.sin / Math.log, which differ from glibc's libm by
one ulp on some inputs.  The reference projects coordinates through
``Math.sin`` and ``Math.log`` (/root/reference/src/convert.js:135-138),
so byte-identical tile parity requires reproducing fdlibm exactly.

These are numpy-vectorized ports of the classic fdlibm kernels
(Copyright (C) 1993 Sun Microsystems — freely distributable algorithm);
``js_sin`` supports |x| < 3π/4 (latitudes map to |rad| ≤ π/2) and
defers to numpy elsewhere.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_I32 = np.int64  # use int64 for 32-bit word arithmetic headroom


def _high_words(x: np.ndarray) -> np.ndarray:
    """Signed 32-bit high word, sign-extended to int64 (fdlibm GET_HIGH_WORD)."""
    return (x.view(np.uint64) >> _U64(32)).astype(np.uint32).astype(np.int32).astype(np.int64)


def _low_words(x: np.ndarray) -> np.ndarray:
    return (x.view(np.uint64) & _U64(0xFFFFFFFF)).astype(np.int64)


def _with_high_word(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    bits = ((hi.astype(np.int64).astype(np.uint64) & _U64(0xFFFFFFFF)) << _U64(32)) \
        | lo.astype(np.uint64)
    return bits.view(np.float64)


# ---------------------------------------------------------------- sin

_S1 = -1.66666666666666324348e-01
_S2 = 8.33333333332248946124e-03
_S3 = -1.98412698298579493134e-04
_S4 = 2.75573137070700676789e-06
_S5 = -2.50507602534068634195e-08
_S6 = 1.58969099521155010221e-10

_C1 = 4.16666666666666019037e-02
_C2 = -1.38888888888741095749e-03
_C3 = 2.48015872894767294178e-05
_C4 = -2.75573143513906633035e-07
_C5 = 2.08757232129817482790e-09
_C6 = -1.13596475577881948265e-11

_PIO2_1 = 1.57079632673412561417e+00
_PIO2_1T = 6.07710050650619224932e-11
_PIO2_2 = 6.07710050630396597660e-11
_PIO2_2T = 2.02226624879595063154e-21


def _kernel_sin(x, y, iy):
    """fdlibm __kernel_sin on |x| ~< pi/4."""
    z = x * x
    r = _S2 + z * (_S3 + z * (_S4 + z * (_S5 + z * _S6)))
    v = z * x
    res_iy0 = x + v * (_S1 + z * r)
    res_iy1 = x - ((z * (0.5 * y - v * r) - y) + v * _S1)
    res = np.where(iy, res_iy1, res_iy0)
    # |x| < 2**-27: return x (inexact shortcut)
    ix = _high_words(np.asarray(x, dtype=np.float64)) & 0x7FFFFFFF
    return np.where(ix < 0x3E400000, x, res)


def _kernel_cos(x, y):
    """fdlibm __kernel_cos on |x| ~< pi/4."""
    x = np.asarray(x, dtype=np.float64)
    ix = _high_words(x) & 0x7FFFFFFF
    z = x * x
    r = z * (_C1 + z * (_C2 + z * (_C3 + z * (_C4 + z * (_C5 + z * _C6)))))
    small = 1.0 - (0.5 * z - (z * r - x * y))
    # x/4 via high-word decrement; clamp to 0.28125 for x > 0.78125
    qx_bits = np.where(ix > 0x3FE90000,
                       _high_words(np.full_like(x, 0.28125)),
                       ix - 0x00200000)
    qx = _with_high_word(qx_bits, np.zeros_like(ix))
    hz = 0.5 * z - qx
    a = 1.0 - qx
    large = a - (hz - (z * r - x * y))
    res = np.where(ix < 0x3FD33333, small, large)
    return np.where(ix < 0x3E400000, np.ones_like(x), res)


def js_sin(x) -> np.ndarray:
    """fdlibm/V8-exact Math.sin for |x| < 3π/4 (else numpy fallback)."""
    x = np.asarray(x, dtype=np.float64)
    scalar = x.ndim == 0
    x = np.atleast_1d(x)
    ix = _high_words(x) & 0x7FFFFFFF

    out = np.empty_like(x)

    # |x| <= pi/4 — no reduction
    m_small = ix <= 0x3FE921FB
    # pi/4 < |x| < 3pi/4 — one-step reduction, n = ±1
    m_mid = (~m_small) & (ix < 0x4002D97C)
    m_rest = ~(m_small | m_mid)

    if m_small.any():
        xs = x[m_small]
        out[m_small] = _kernel_sin(xs, np.zeros_like(xs), np.zeros_like(xs, dtype=bool))

    if m_mid.any():
        xm = x[m_mid]
        ixm = ix[m_mid]
        pos = xm > 0
        ax = np.abs(xm)
        z = ax - _PIO2_1
        near = ixm == 0x3FF921FB  # x close to pi/2: need extra word
        z = np.where(near, z - _PIO2_2, z)
        t = np.where(near, _PIO2_2T, _PIO2_1T)
        y0 = z - t
        y1 = (z - y0) - t
        # sin(|x|) = cos(y) for n=1; sin is odd
        c = _kernel_cos(y0, y1)
        out[m_mid] = np.where(pos, c, -c)

    if m_rest.any():
        out[m_rest] = np.sin(x[m_rest])  # outside parity-relevant domain

    return out[0] if scalar else out


# ---------------------------------------------------------------- log

_LG1 = 6.666666666666735130e-01
_LG2 = 3.999999999940941908e-01
_LG3 = 2.857142874366239149e-01
_LG4 = 2.222219843214978396e-01
_LG5 = 1.818357216161805012e-01
_LG6 = 1.531383769920937332e-01
_LG7 = 1.479819860511658591e-01
_LN2_HI = 6.93147180369123816490e-01
_LN2_LO = 1.90821492927058770002e-10
_TWO54 = 1.80143985094819840000e+16


def js_log(x) -> np.ndarray:
    """fdlibm/V8-exact Math.log for finite positive doubles."""
    x = np.asarray(x, dtype=np.float64)
    scalar = x.ndim == 0
    x = np.atleast_1d(x).copy()

    hx = _high_words(x)
    lx = _low_words(x)
    k = np.zeros(x.shape, dtype=np.int64)

    zero_mask = ((hx & 0x7FFFFFFF) | lx) == 0
    neg_mask = (hx < 0) | (x != x)  # negative or nan
    inf_mask = hx >= 0x7FF00000

    # subnormals: scale up by 2**54
    sub = (hx < 0x00100000) & ~zero_mask & ~neg_mask
    if sub.any():
        x[sub] = x[sub] * _TWO54
        k[sub] -= 54
        hx = _high_words(x)

    k = k + (hx >> 20) - 1023
    hx = hx & 0x000FFFFF
    i = (hx + 0x95F64) & 0x100000
    x = _with_high_word(hx | (i ^ 0x3FF00000), _low_words(x))
    k = k + (i >> 20)
    f = x - 1.0
    dk = k.astype(np.float64)

    # main path
    s = f / (2.0 + f)
    z = s * s
    w = z * z
    t1 = w * (_LG2 + w * (_LG4 + w * _LG6))
    t2 = z * (_LG1 + w * (_LG3 + w * (_LG5 + w * _LG7)))
    r = t2 + t1
    ii = (hx - 0x6147A) | (0x6B851 - hx)
    hfsq = 0.5 * f * f

    big = np.where(k == 0,
                   f - (hfsq - s * (hfsq + r)),
                   dk * _LN2_HI - ((hfsq - (s * (hfsq + r) + dk * _LN2_LO)) - f))
    small = np.where(k == 0,
                     f - s * (f - r),
                     dk * _LN2_HI - ((s * (f - r) - dk * _LN2_LO) - f))
    out = np.where(ii > 0, big, small)

    # tiny-f path: (0x000fffff & (2+hx)) < 3
    tiny = (np.bitwise_and(2 + hx, 0x000FFFFF)) < 3
    if tiny.any():
        rz = f * f * (0.5 - 0.33333333333333333 * f)
        t_f0 = np.where(k == 0, np.zeros_like(f), dk * _LN2_HI + dk * _LN2_LO)
        t_f = np.where(k == 0, f - rz, dk * _LN2_HI - ((rz - dk * _LN2_LO) - f))
        tiny_val = np.where(f == 0.0, t_f0, t_f)
        out = np.where(tiny, tiny_val, out)

    out = np.where(zero_mask, -np.inf, out)
    out = np.where(neg_mask, np.nan, out)
    out = np.where(inf_mask & ~neg_mask, np.inf, out)
    return out[0] if scalar else out
