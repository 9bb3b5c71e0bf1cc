"""Bit-faithful GEO_TILE_ES for the replay corpus.

At zoom 32 every output unit is 2^-48 of the projection, so the tile id
depends on the reference's EXACT floating-point kernels, not on true
sin/ln: the reference evaluates sin with a SLEEF-u35-style Estrin
scheme whose s^5 coefficient is the table's 2.81e-15 constant rather
than SLEEF's 1.589e-10 term (vm/bc_macros_amd64.h:514 BC_FAST_SIN_4ULP
constant table at :500-511 — offsets 24..80 only), which puts its
result ~3e-10 away from libm sin — about 0.8 tiles at zoom 32.  This
module re-evaluates the same FMA chain (vm/evalbc_amd64.s:4125
geotilees_tail) scalar-wise, with real fused multiply-adds via libm.

Semantic port (the instruction stream is public and documented above);
no code is copied — there is nothing textual to copy from assembly.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import math

_libm = ctypes.CDLL(ctypes.util.find_library("m") or "libm.so.6")
_libm.fma.restype = ctypes.c_double
_libm.fma.argtypes = [ctypes.c_double, ctypes.c_double, ctypes.c_double]


def _fma(a: float, b: float, c: float) -> float:
    return _libm.fma(a, b, c)


# const_sin_u35 table (vm/bc_macros_amd64.h:500-511)
_S_NPI = -3.1415926535897931
_S_INVPI = 0.31830988618379069
_S_PITAIL = -1.2246467991473532e-16
_S24 = -7.9725595500903787e-18
_S32 = -7.6471221911815883e-13
_S40 = 2.810099727108632e-15
_S48 = -2.5052108376350205e-8
_S56 = 2.7557319223919875e-6
_S64 = -1.9841269841269616e-4
_S72 = 0.0083333333333333297
_S80 = -0.16666666666666666


def fast_sin(x: float) -> float:
    """BC_FAST_SIN_4ULP, one lane."""
    # round-to-nearest-even of x/pi (VRNDSCALEPD $8 on a plain product)
    q = float(round(x * _S_INVPI))
    x = _fma(q, _S_NPI, x)
    x = _fma(q, _S_PITAIL, x)
    s = x * x
    if int(q) & 1:
        x = -x
    a = _fma(s, _S24, _S40)
    b = _fma(s, _S32, _S40)
    s2 = s * s
    b = _fma(s2, a, b)
    c = _fma(s, _S48, _S56)
    d = _fma(s, _S64, _S72)
    d = _fma(s2, c, d)
    s4 = s2 * s2
    e = _fma(s4, b, d)
    u = _fma(s, e, _S80)
    return _fma(s, u * x, x)


# const_ln_u35 table (vm/bc_macros_amd64.h:763-775); lane-A addend c24
_L16 = 0.15251991700635195
_L24 = 0.18186326625198299
_L32 = 0.15348733849142507
_L40 = 0.22222136651876737
_L48 = 0.28571429474654803
_L56 = 0.3999999999507996
_L64 = 0.66666666666677787
_LN2 = 0.69314718055994529


def fast_ln(x: float) -> float:
    """BC_FAST_LN_4ULP, lane A."""
    # e = getexp(x * 4/3); m = getmant(x, [0.75, 1.5))
    mant, ex = math.frexp(x * 1.3333333333333333)  # mant in [0.5, 1)
    e = float(ex - 1)
    mant_x, ex_x = math.frexp(x)
    m = mant_x if mant_x >= 0.75 else mant_x * 2.0
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    t4 = t2 * t2
    t8 = t4 * t4
    a = _fma(t2, _L16, _L24)
    a = _fma(t4, _L32, a)
    b = _fma(t2, _L40, _L48)
    c = _fma(t2, _L56, _L64)
    c = _fma(t4, b, c)
    out = e * _LN2
    out = _fma(t, 2.0, out)
    c = _fma(t8, a, c)
    t3 = t2 * t
    return _fma(t3, c, out)


_PI_180 = 0.017453292519943295  # CONSTF64_PI_DIV_180
_HALF48 = 140737488355328.0  # 2^47
_K360 = 281474976710656.0 / 360.0
_K4PI = 281474976710656.0 / (4.0 * math.pi)
_U48MAX = (1 << 48) - 1


def _cvt_u64_rz(v: float) -> int:
    """VCVTPD2UQQ.RZ: truncate toward zero; out-of-range -> 2^64-1."""
    if not (0.0 <= v < 18446744073709551616.0):
        return (1 << 64) - 1
    return int(v)


def _minsq_u48(u: int) -> int:
    """VPMINSQ with 2^48-1 — SIGNED min on the 64-bit lane."""
    s = u - (1 << 64) if u >= (1 << 63) else u
    return u if s < _U48MAX else _U48MAX


def geo_tile_es(lat, lon, prec) -> str | None:
    if lat is None or lon is None or prec is None:
        return None
    prec = max(0, min(32, int(prec)))
    s = fast_sin(float(lat) * _PI_180)
    s = max(-0.9999, min(0.9999, s))
    lnr = fast_ln((1.0 + s) / (1.0 - s))
    y48 = _minsq_u48(_cvt_u64_rz(_fma(-_K4PI, lnr, _HALF48)))
    x48 = _minsq_u48(_cvt_u64_rz(_fma(float(lon), _K360, _HALF48)))
    shift = 48 - prec
    return f"{prec}/{(x48 & ((1 << 64) - 1)) >> shift}/{(y48 & ((1 << 64) - 1)) >> shift}"

def cosine_distance_ref(a, b):
    """COSINE_DISTANCE with the reference's FMA accumulation
    (vm/evalbc_amd64.s:8549 bcvectorcosinedistance): per-element
    dot/na/nb accumulate through fused multiply-adds, the denominator
    is sqrt(na*nb), and a non-positive denominator (incl. empty
    arrays) yields 0 rather than NULL/NaN."""
    if a is None or b is None:
        return None
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        if x is None or y is None:
            continue
        x, y = float(x), float(y)
        dot = _fma(x, y, dot)
        na = _fma(x, x, na)
        nb = _fma(y, y, nb)
    denom = math.sqrt(na * nb)
    if not denom > 0.0:
        return 0.0
    return 1.0 - dot / denom
