"""The S-curve squaring ladder must be bit-identical across Python,
Spark, and DuckDB — that is the whole determinism contract behind
summing it in exact 1e-6 integer units in the lsh_band_tuning gate."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from pyspark_graph_spark.dedup.minhash import (
    scurve_catch_micro,
    scurve_catch_micro_sql,
)

CONFIGS = ((32, 2), (16, 4), (8, 8), (4, 16))
GRID = [i / 64 for i in range(33, 64)] + [0.5, 1.0, 0.987654321]


def _ladder_py(s: float, bands: int, rows: int) -> int:
    x = s
    e = rows
    while e > 1:
        x = x * x
        e //= 2
    x = 1.0 - x
    e = bands
    while e > 1:
        x = x * x
        e //= 2
    p = (1.0 - x) * 1000000.0
    # round-half-up like Spark/DuckDB ROUND (python round() is banker's)
    import math

    return int(math.floor(p + 0.5))


def test_sql_ladder_matches_python():
    for b, r in CONFIGS:
        expr = scurve_catch_micro_sql("s", b, r)
        vals = ", ".join(f"({v!r})" for v in GRID)
        got = [
            row[0]
            for row in duckdb.sql(
                f"SELECT {expr} FROM (VALUES {vals}) t(s)"
            ).fetchall()
        ]
        want = [_ladder_py(s, b, r) for s in GRID]
        assert got == want, (b, r)


def test_spark_ladder_matches_python(spark):
    df = spark.createDataFrame([(s,) for s in GRID], "s double")
    cols = [
        scurve_catch_micro(F.col("s"), b, r).alias(f"m_{b}_{r}")
        for b, r in CONFIGS
    ]
    rows = df.select("s", *cols).collect()
    for row in rows:
        for b, r in CONFIGS:
            assert row[f"m_{b}_{r}"] == _ladder_py(row["s"], b, r), (
                row["s"],
                b,
                r,
            )


def test_non_power_of_two_rejected():
    with pytest.raises(ValueError):
        scurve_catch_micro(F.lit(0.5), 3, 4)
    with pytest.raises(ValueError):
        scurve_catch_micro_sql("s", 16, 5)


def test_scurve_monotone_in_similarity():
    for b, r in CONFIGS:
        vals = [_ladder_py(s, b, r) for s in GRID if s <= 1.0]
        ordered = [v for _, v in sorted(zip(GRID, vals))]
        assert ordered == sorted(ordered)
        assert _ladder_py(1.0, b, r) == 1000000


def test_levenshtein_cross_engine(spark):
    """dedup_edit_verify's determinism rests on Spark and DuckDB agreeing
    on levenshtein for arbitrary inputs — pin it on adversarial cases."""
    cases = [
        ("kitten", "sitting"), ("", ""), ("", "abc"), ("abc", ""),
        ("abc", "abc"), ("a" * 200, "a" * 199 + "b"),
        ("ab" * 100, "ba" * 100), ("x", "y"),
        ("the quick brown fox", "the quick brown fax"),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(cases, "s1 string, s2 string")
    got = {
        (r["s1"], r["s2"]): r["d"]
        for r in df.select(
            "s1", "s2", F.levenshtein("s1", "s2").alias("d")
        ).collect()
    }
    for s1, s2 in cases:
        want = duckdb.sql(
            "SELECT levenshtein(?, ?)", params=[s1, s2]
        ).fetchone()[0]
        assert got[(s1, s2)] == want, (s1, s2)


def test_ascii_normalizer_cross_engine_on_nasty_text(spark):
    """Round-9 hardening (ADVICE r8): Spark levenshtein counts CODE POINTS
    while DuckDB's counts BYTES (e.g. 'café'→'cafe' is 1 vs 2), and Java
    \\s includes \\x0B while RE2's does not — so dedup_edit_verify's
    cross-engine determinism holds only after projecting to printable
    ASCII. Pin that the shared normalizer produces the IDENTICAL byte
    string in both engines on multi-byte, astral-plane, combining-mark,
    and control-whitespace inputs, and that levenshtein then agrees."""
    from pyspark_graph_spark.queries.dedup import _ASCII_NORM_SQL, _ascii_norm

    nasty = [
        "café NAÏVE touché",
        "日本語 text 混in",
        "emoji 😀😀 and astral 𝕏𝕐 marks",
        "á combining é",          # combining acute accents
        "tab\tand\x0bvertical\x0btab\fff\rcr\nnl",
        "  leading   and trailing   ",
        " nbsp em-space​zwsp",
        "pure ascii stays EXACTLY as lowered",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(nasty)],
                               "i int, text string")
    got = {
        r["i"]: r["n"]
        for r in df.select("i", _ascii_norm(F.col("text")).alias("n")).collect()
    }
    for i, t in enumerate(nasty):
        want = duckdb.sql(
            f"SELECT {_ASCII_NORM_SQL} FROM (SELECT ? AS text)", params=[t]
        ).fetchone()[0]
        assert got[i] == want, (t, got[i], want)
        assert all(0x20 <= ord(c) <= 0x7E for c in got[i])
    # and on the normalized strings the two levenshteins agree exactly
    pairs = [
        (got[i], got[j])
        for i in range(len(nasty))
        for j in range(i + 1, len(nasty))
    ]
    pdf = spark.createDataFrame(pairs, "s1 string, s2 string")
    spark_d = {
        (r["s1"], r["s2"]): r["d"]
        for r in pdf.select(
            "s1", "s2", F.levenshtein("s1", "s2").alias("d")
        ).collect()
    }
    for s1, s2 in pairs:
        d_duck = duckdb.sql(
            "SELECT levenshtein(?, ?)", params=[s1, s2]
        ).fetchone()[0]
        assert spark_d[(s1, s2)] == d_duck, (s1, s2)
