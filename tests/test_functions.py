"""Scalar builtin analogs (functions/scalar.py) vs python references."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sneller_spark.functions import (
    cosine_distance,
    date_bin,
    equals_fuzzy,
    geo_distance_m,
    geo_hash,
    geo_tile_es,
    geo_tile_x,
    geo_tile_y,
    inner_product,
    ip_to_long,
    is_subnet_of,
    l1_distance,
    l2_distance,
    time_bucket,
)


def test_ip_to_long_and_subnet(spark):
    rows = [
        ("10.1.2.3",), ("10.1.255.255",), ("10.2.0.0",), ("192.168.1.1",),
        ("255.255.255.255",), ("not-an-ip",), ("1.2.3.999",),
    ]
    df = spark.createDataFrame(rows, ["ip"])
    got = df.select(
        "ip",
        ip_to_long(F.col("ip")).alias("v"),
        is_subnet_of("10.1.0.0/16", F.col("ip")).alias("in16"),
        is_subnet_of("0.0.0.0/0", F.col("ip")).alias("all"),
    ).toPandas().set_index("ip")
    assert got.loc["10.1.2.3", "v"] == (10 << 24) + (1 << 16) + (2 << 8) + 3
    assert got.loc["255.255.255.255", "v"] == (1 << 32) - 1
    assert got.loc["not-an-ip", "v"] is None or np.isnan(got.loc["not-an-ip", "v"])
    assert bool(got.loc["10.1.2.3", "in16"]) and bool(got.loc["10.1.255.255", "in16"])
    assert got.loc["10.2.0.0", "in16"] == False  # noqa: E712
    assert bool(got.loc["192.168.1.1", "all"])


def test_vector_distances(spark):
    a = [1.0, 2.0, 3.0]
    b = [4.0, -5.0, 6.0]
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    got = df.select(
        inner_product(F.col("a"), F.col("b")).alias("ip"),
        l1_distance(F.col("a"), F.col("b")).alias("l1"),
        l2_distance(F.col("a"), F.col("b")).alias("l2"),
        cosine_distance(F.col("a"), F.col("b")).alias("cd"),
    ).first()
    na, nb = np.array(a), np.array(b)
    assert got["ip"] == pytest.approx(float(na @ nb))
    assert got["l1"] == pytest.approx(float(np.abs(na - nb).sum()))
    assert got["l2"] == pytest.approx(float(np.linalg.norm(na - nb)))
    assert got["cd"] == pytest.approx(
        1 - float(na @ nb) / (np.linalg.norm(na) * np.linalg.norm(nb))
    )


def test_fuzzy_equals(spark):
    df = spark.createDataFrame([("kitten", "sitten"), ("kitten", "sitting")], ["a", "b"])
    got = df.select(equals_fuzzy(F.col("a"), F.col("b"), 1).alias("f1"),
                    equals_fuzzy(F.col("a"), F.col("b"), 3).alias("f3")).collect()
    assert [r["f1"] for r in got] == [True, False]
    assert [r["f3"] for r in got] == [True, True]


def test_time_bucket_date_bin(spark):
    df = spark.createDataFrame([("2024-03-05 07:29:59",), ("2024-03-05 07:30:00",)], ["s"])
    df = df.select(F.col("s").cast("timestamp").alias("ts"))
    got = df.select(
        time_bucket(F.col("ts"), 1800).cast("string").alias("tb"),
        date_bin(F.col("ts"), 3600, "2024-01-01 00:30:00").cast("string").alias("db"),
    ).collect()
    assert got[0]["tb"] == "2024-03-05 07:00:00"
    assert got[1]["tb"] == "2024-03-05 07:30:00"
    assert got[0]["db"] == "2024-03-05 06:30:00"  # bins anchored at :30


def test_geo_functions(spark):
    df = spark.createDataFrame([(42.6, -5.6), (51.5007, -0.1246)], ["lat", "lon"])
    got = df.select(
        geo_tile_x(F.col("lon"), 10).alias("tx"),
        geo_tile_y(F.col("lat"), 10).alias("ty"),
        geo_tile_es(F.col("lat"), F.col("lon"), 10).alias("tes"),
        geo_hash(F.col("lat"), F.col("lon"), 5).alias("gh"),
    ).collect()

    def ref_tile(lat, lon, z):
        n = 1 << z
        x = math.floor((lon + 180) / 360 * n)
        lr = math.radians(lat)
        y = math.floor((1 - math.log(math.tan(lr) + 1 / math.cos(lr)) / math.pi) / 2 * n)
        return x, y

    for row, (lat, lon) in zip(got, [(42.6, -5.6), (51.5007, -0.1246)]):
        x, y = ref_tile(lat, lon, 10)
        assert (row["tx"], row["ty"]) == (x, y)
        assert row["tes"] == f"10/{x}/{y}"
    assert got[0]["gh"] == "ezs42"  # canonical geohash example


def test_geo_distance(spark):
    # London -> Paris ~ 343 km
    df = spark.createDataFrame([(51.5007, -0.1246, 48.8566, 2.3522)], ["a", "b", "c", "d"])
    got = df.select(
        geo_distance_m(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("m")
    ).first()["m"]
    assert 330_000 < got < 350_000


def test_contains_fuzzy_matches_dp_oracle(spark):
    """contains_fuzzy vs an independent substring-edit-distance DP
    (first DP row all zeros: match may start anywhere — the textbook
    semantics of the reference's refHasSubstrFuzzy,
    /root/reference/fuzzy/edit_distance_approx.go:325)."""
    from sneller_spark.functions import contains_fuzzy, contains_fuzzy_unicode

    def substr_edit_distance(data: str, needle: str) -> int:
        n, m = len(needle), len(data)
        prev = [0] * (m + 1)  # free start anywhere in data
        for i in range(1, n + 1):
            cur = [i] + [0] * m
            for j in range(1, m + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (needle[i - 1] != data[j - 1]),
                )
            prev = cur
        return min(prev)

    cases = [
        "the server kernel panicked",
        "kernal panic in module x",     # 1 edit inside
        "completely unrelated text",
        "panick",                        # 1 edit, whole string
        "",                              # empty data
        "pnic",                          # deletion
        "ppaanniicc",
        "unicode ünïcode panïc here",    # multibyte chars
    ]
    needle, t = "panic", 1
    df = spark.createDataFrame([(c,) for c in cases], ["s"])
    got = {
        r["s"]: (r["m"], r["mu"])
        for r in df.select(
            "s",
            contains_fuzzy(F.col("s"), needle, t).alias("m"),
            contains_fuzzy_unicode(F.col("s"), needle, t).alias("mu"),
        ).collect()
    }
    for c in cases:
        exp = substr_edit_distance(c, needle) <= t
        assert got[c][0] == exp, f"{c!r}: got {got[c][0]}, want {exp}"
        assert got[c][1] == exp  # unicode variant identical on all inputs


def test_contains_fuzzy_threshold_zero_is_contains(spark):
    from sneller_spark.functions import contains_fuzzy

    df = spark.createDataFrame([("hello world",), ("helo world",)], ["s"])
    got = [r["m"] for r in df.select(contains_fuzzy(F.col("s"), "hello", 0).alias("m")).collect()]
    assert got == [True, False]


def test_contains_fuzzy_random_corpus_vs_dp(spark):
    """300 seeded random strings over a tiny alphabet (dense edit-
    distance space) vs the DP oracle, at thresholds 0..2, one Spark
    job per threshold."""
    import numpy as np

    from sneller_spark.functions import contains_fuzzy

    def substr_edit_distance(data: str, needle: str) -> int:
        n, m = len(needle), len(data)
        prev = [0] * (m + 1)
        for i in range(1, n + 1):
            cur = [i] + [0] * m
            for j in range(1, m + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (needle[i - 1] != data[j - 1]))
            prev = cur
        return min(prev)

    rng = np.random.Generator(np.random.PCG64(11))
    alphabet = np.array(list("ab c"))
    corpus = [
        "".join(alphabet[rng.integers(0, len(alphabet), size=rng.integers(0, 13))])
        for _ in range(300)
    ]
    needle = "abab"
    df = spark.createDataFrame([(i, s) for i, s in enumerate(corpus)], ["i", "s"])
    for t in (0, 1, 2):
        got = {
            r["i"]: r["m"]
            for r in df.select("i", contains_fuzzy(F.col("s"), needle, t).alias("m")).collect()
        }
        for i, s in enumerate(corpus):
            exp = substr_edit_distance(s, needle) <= t
            assert got[i] == exp, f"t={t} s={s!r}: got {got[i]}, want {exp}"


def test_time_bucket_fractional_and_string_ts(spark):
    """Round-6 contract: fractional bucket widths (the reference's
    DATE_BIN supports 500 ms bins) are exact to 1 us; string ts
    columns are cast; zero/negative widths raise eagerly instead of
    an in-plan pmod-by-zero."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from sneller_spark.functions.scalar import date_bin, time_bucket

    df = spark.createDataFrame(
        [("2024-03-01 12:00:01.730",), ("2024-03-01 12:00:01.499999",)],
        "ts string",
    )
    got = [
        r["b"]
        for r in df.select(
            F.unix_micros(time_bucket(F.col("ts"), 0.5)).alias("b")
        ).collect()
    ]
    assert got == [1709294401500000, 1709294401000000]
    got2 = df.select(
        F.unix_micros(date_bin(F.col("ts"), 0.5)).alias("b")
    ).collect()
    assert [r["b"] for r in got2] == got
    with _pytest.raises(ValueError, match="microsecond"):
        time_bucket(F.col("ts"), 0)
    with _pytest.raises(ValueError, match="microsecond"):
        date_bin(F.col("ts"), -3)
