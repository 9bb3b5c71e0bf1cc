"""Scalar builtin analogs of the reference's closed function set
(/root/reference/expr/builtin.go:103-253).  Everything here is a
Column-in/Column-out expression built from pyspark.sql.functions —
JVM-side, codegen'd — except geo_hash, which is an Arrow-batched
pandas UDF (bit-interleaving has no clean Catalyst expression).

Functions Spark already ships 1:1 (CONCAT, TRIM, UPPER, SPLIT_PART,
LEAST, WIDTH_BUCKET, DATE_TRUNC, ...) are used directly at call sites
(see query_catalog.py) and are not re-wrapped here.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------
# string predicates (CONTAINS_CI / EQUALS_CI / EQUALS_FUZZY —
# expr/builtin.go:1086-1091, fuzzy/edit_distance_approx.go)
# ---------------------------------------------------------------------

def contains_ci(col: Column, needle: str) -> Column:
    return F.contains(F.lower(col), F.lit(needle.lower()))


def equals_ci(col: Column, other: str) -> Column:
    return F.lower(col) == other.lower()


def equals_fuzzy(a: Column, b: Column, max_edits: int = 2) -> Column:
    """EQUALS_FUZZY: approximate equality within an edit-distance
    budget.  The reference uses a SIMD approximation
    (fuzzy/edit_distance_approx.go); exact levenshtein is strictly
    stronger."""
    return F.levenshtein(a, b) <= max_edits


def contains_fuzzy(data: Column, needle: str, max_edits: int = 2) -> Column:
    """CONTAINS_FUZZY(data, needle, t): true when SOME substring of
    data is within edit distance t of the needle — the reference's
    has-substr-fuzzy (expr/builtin.go:1088,
    fuzzy/edit_distance_approx.go:325 refHasSubstrFuzzy: prefix-fuzzy
    tried at every start offset).

    Exact formulation (strictly stronger than the reference's Approx3
    lookahead kernel): any substring within distance t of an n-char
    needle has length in [n-t, n+t], so it suffices to test the 2t+1
    window lengths at every start position.  Entirely JVM-side: one
    higher-order EXISTS over start positions, an OR of bounded
    levenshtein calls per position — no Python boundary.

    Cost is O(len(data) * (2t+1)) bounded levenshteins per row (and a
    per-row position array of len(data) ints): built for needle-sized
    haystacks (names, keys, log fields).  For document-length data,
    prefilter candidates first (e.g. rows containing a cheap anchor
    substring of the needle) before applying this predicate."""
    t = int(max_edits)
    n = len(needle)
    nl = F.lit(needle)
    # empty data: matches iff the whole needle can be "inserted" (the
    # reference's lenData==0 branch) — covered by the w=0 window below
    starts = F.sequence(F.lit(1), F.greatest(F.length(data), F.lit(1)))

    def ok_at(i: Column) -> Column:
        cond = F.lit(False)
        for w in range(max(n - t, 0), n + t + 1):
            cond = cond | (F.levenshtein(F.substring(data, i, F.lit(w)), nl) <= t)
        return cond

    return F.exists(starts, ok_at)


def contains_fuzzy_unicode(data: Column, needle: str, max_edits: int = 2) -> Column:
    """CONTAINS_FUZZY_UNICODE (expr/builtin.go:1089): the reference
    splits ASCII (byte) vs unicode (rune) kernels; Spark strings are
    codepoint-based already, so the unicode semantics ARE the native
    ones and both variants share one implementation."""
    return contains_fuzzy(data, needle, max_edits)


# ---------------------------------------------------------------------
# IS_SUBNET_OF (expr/builtin.go:1092) — IPv4 bit math, no UDF
# ---------------------------------------------------------------------

def ip_to_long(ip: Column) -> Column:
    """Dotted-quad IPv4 string -> uint32 as LONG (null on malformed)."""
    parts = F.split(ip, r"\.")
    # try_element_at: null (not an ANSI error) when a quad is missing
    octets = [F.try_element_at(parts, F.lit(i + 1)).try_cast("long") for i in range(4)]
    valid = F.size(parts) == 4
    for o in octets:
        valid = valid & o.isNotNull() & (o >= 0) & (o <= 255)
    value = (
        octets[0] * F.lit(16777216)
        + octets[1] * F.lit(65536)
        + octets[2] * F.lit(256)
        + octets[3]
    )
    return F.when(valid, value)


def is_subnet_of(cidr: str, ip: Column) -> Column:
    """IS_SUBNET_OF('10.1.0.0/16', ip_col): true when ip falls inside
    the CIDR block.  Mask math on longs — whole-stage codegen."""
    net_s, bits_s = cidr.split("/")
    bits = int(bits_s)
    mask = ((1 << 32) - 1) ^ ((1 << (32 - bits)) - 1) if bits else 0
    net = 0
    for part in net_s.split("."):
        net = (net << 8) | int(part)
    net &= mask
    return ip_to_long(ip).bitwiseAND(F.lit(mask)) == F.lit(net)


def ip_in_range(start: Column, end: Column, ip: Column) -> Column:
    """The reference's 3-argument IS_SUBNET_OF(start, end, ip)
    (vm/testdata/queries/0059-string-subnet-of): inclusive dotted-quad
    range membership, leading-zero octets accepted, null on any
    malformed address.  Registered in the SQL veneer as IP_IN_RANGE —
    Spark SQL UDF names cannot overload the 2-arg CIDR form by
    arity."""
    return ip_to_long(ip).between(ip_to_long(start), ip_to_long(end))


# ---------------------------------------------------------------------
# vector distances (expr/builtin.go:227-230) — higher-order array exprs
# ---------------------------------------------------------------------

def _fold_sum(col: Column) -> Column:
    return F.aggregate(col, F.lit(0.0), lambda acc, v: acc + v)


def inner_product(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def l1_distance(a: Column, b: Column) -> Column:
    return _fold_sum(
        F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double")))
    )


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        _fold_sum(
            F.zip_with(
                a, b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            )
        )
    )


def cosine_distance(a: Column, b: Column) -> Column:
    """1 - cos(a, b).  A zero-norm (or empty) vector has no defined
    cosine: try_divide yields NULL instead of the ANSI DIVIDE_BY_ZERO
    error — at 100 TB one all-zero embedding must not kill the job
    (fuzz-found; same guard in the SQL veneer body)."""
    return 1.0 - F.try_divide(
        inner_product(a, b),
        F.sqrt(inner_product(a, a)) * F.sqrt(inner_product(b, b)),
    )


# ---------------------------------------------------------------------
# DATE_BIN / TIME_BUCKET (expr/builtin.go:1155-1170)
# ---------------------------------------------------------------------

def _interval_micros(seconds) -> int:
    """Bucket width in whole micros; fractional seconds (the
    reference's DATE_BIN supports e.g. 500 ms bins) are exact down to
    1 us.  Zero/negative widths fail here, not as an opaque in-plan
    pmod-by-zero."""
    b = int(round(float(seconds) * 1_000_000))
    if b <= 0:
        raise ValueError(f"bucket width must be >= 1 microsecond, got {seconds!r}")
    return b


def time_bucket(ts: Column, seconds) -> Column:
    """TIME_BUCKET(interval, ts) -> epoch-aligned bucket start (ts).

    Full-microsecond precision, exact integer arithmetic: the bucket is
    ``m - pmod(m, b)`` over unix_micros (floor-mod, so pre-epoch
    timestamps floor correctly too) — a fractional-second timestamp
    just below a boundary lands in the earlier bucket, matching the
    reference's DATE_BIN at full timestamp precision
    (expr/builtin.go:1155-1170).  `seconds` may be fractional (500 ms
    bins); string/date ts columns are cast to timestamp first."""
    b = F.lit(_interval_micros(seconds))
    m = F.unix_micros(ts.cast("timestamp"))
    return F.timestamp_micros(m - F.pmod(m, b))


def date_bin(ts: Column, seconds, origin: str = "1970-01-01 00:00:00") -> Column:
    """DATE_BIN(interval, ts, origin): floor ts into interval-sized
    bins anchored at origin.  Exact micros arithmetic (see
    time_bucket)."""
    og = F.unix_micros(F.lit(origin).cast("timestamp"))
    m = F.unix_micros(ts.cast("timestamp"))
    b = F.lit(_interval_micros(seconds))
    return F.timestamp_micros(m - F.pmod(m - og, b))


# ---------------------------------------------------------------------
# geo builtins (expr/builtin.go:1183-1188)
# ---------------------------------------------------------------------

def geo_distance_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """GEO_DISTANCE: haversine metres, pure column math.  2R =
    12742000 exactly — the reference's CONSTF64_12742000 constant
    (vm/evalbc_amd64.s:4573 bcgeodistance), not the IUGG mean radius."""
    r = 6371000.0
    p = math.pi / 180.0
    dlat = (lat2 - lat1) * p / 2
    dlon = (lon2 - lon1) * p / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(lat1 * p) * F.cos(lat2 * p) * F.sin(
        dlon
    ) * F.sin(dlon)
    return 2 * r * F.asin(F.sqrt(a))


def geo_tile_x(lon: Column, zoom: int) -> Column:
    """GEO_TILE_X: web-mercator tile x at zoom."""
    n = 1 << zoom
    return F.floor((lon + 180.0) / 360.0 * n).cast("long")


def geo_tile_y(lat: Column, zoom: int) -> Column:
    """GEO_TILE_Y: web-mercator tile y at zoom."""
    n = 1 << zoom
    p = math.pi / 180.0
    lat_rad = lat * p
    y = (1.0 - F.log(F.tan(lat_rad) + 1.0 / F.cos(lat_rad)) / math.pi) / 2.0
    return F.floor(y * n).cast("long")


def geo_tile_es(lat: Column, lon: Column, zoom: int) -> Column:
    """GEO_TILE_ES: Elasticsearch-style 'zoom/x/y' tile key."""
    return F.concat_ws(
        "/", F.lit(str(zoom)), geo_tile_x(lon, zoom).cast("string"),
        geo_tile_y(lat, zoom).cast("string")
    )


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_kernel(lat, lon, precision: int):
    import numpy as np
    import pandas as pd

    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    nbits = precision * 5
    # interleave lon/lat bits via iterative bisection, fully vectorized
    lat_lo = np.full_like(lat, -90.0)
    lat_hi = np.full_like(lat, 90.0)
    lon_lo = np.full_like(lon, -180.0)
    lon_hi = np.full_like(lon, 180.0)
    bits = np.zeros((len(lat), nbits), dtype=np.uint8)
    for i in range(nbits):
        if i % 2 == 0:  # even bit: longitude
            mid = (lon_lo + lon_hi) / 2
            b = lon >= mid
            lon_lo = np.where(b, mid, lon_lo)
            lon_hi = np.where(b, lon_hi, mid)
        else:
            mid = (lat_lo + lat_hi) / 2
            b = lat >= mid
            lat_lo = np.where(b, mid, lat_lo)
            lat_hi = np.where(b, lat_hi, mid)
        bits[:, i] = b
    chars = np.zeros((len(lat), precision), dtype=np.int64)
    for i in range(nbits):
        chars[:, i // 5] = chars[:, i // 5] * 2 + bits[:, i]
    lut = np.array(list(_GEOHASH32))
    out = lut[chars]
    return pd.Series(["".join(row) for row in out])


_geohash_udf_cache: dict[int, object] = {}


def geo_hash(lat: Column, lon: Column, precision: int = 7) -> Column:
    """GEO_HASH: standard base32 geohash.  Bit interleaving is an
    Arrow-batched pandas UDF (numpy-vectorized bisection; the only
    per-row python is the final string join over `precision` chars)."""
    if precision not in _geohash_udf_cache:
        def _kernel(lat_s: "pd.Series", lon_s: "pd.Series") -> "pd.Series":
            return _geohash_kernel(lat_s, lon_s, precision)

        # annotations must resolve at registration (PEP 563 strings):
        _kernel.__annotations__ = {"lat_s": pd.Series, "lon_s": pd.Series,
                                   "return": pd.Series}
        _udf = F.pandas_udf("string")(_kernel)

        _geohash_udf_cache[precision] = _udf
    return _geohash_udf_cache[precision](lat, lon)
