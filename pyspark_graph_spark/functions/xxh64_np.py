"""Vectorized NumPy replica of Spark's ``xxhash64`` expression.

Spark's ``F.xxhash64(c1, c2, ...)`` folds xxHash64 over the children with
seed 42: ``h = 42; for child: h = XXH64.hash<Type>(child, h)`` — LongType
children hash 8 bytes, IntegerType children hash 4 bytes (the algorithm is
the finalization path of the public xxHash64 spec, as implemented in
``org.apache.spark.sql.catalyst.expressions.XXH64``).

The batch kernels (Luby MIS / greedy coloring) previously shipped every
per-round priority as a Spark-projected column — ``_LOCAL_ROUNDS`` wide —
because the batch must consume bit-identical priorities to the distributed
rounds. This module removes that width: the batch computes the SAME values
in vectorized uint64 NumPy, pinned bit-for-bit against ``F.xxhash64`` by
``tests/test_xxh64_np.py`` over negative/positive/boundary inputs.

Public knowledge only: the xxHash64 algorithm (Yann Collet, BSD) and the
Spark source.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

SPARK_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    inv = np.uint64(64 - r)
    return (x << r_) | (x >> inv)


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def hash_long(value: np.ndarray, seed: np.ndarray | np.uint64) -> np.ndarray:
    """XXH64.hashLong: one 8-byte lane + finalization."""
    v = value.astype(np.int64).view(np.uint64)
    h = seed + _P5 + np.uint64(8)
    h = h ^ (_rotl(v * _P2, 31) * _P1)
    h = _rotl(h, 27) * _P1 + _P4
    return _fmix(h)


def hash_int(value: np.ndarray | int, seed: np.ndarray | np.uint64) -> np.ndarray:
    """XXH64.hashInt: one 4-byte lane (zero-extended) + finalization."""
    v = np.asarray(value, dtype=np.int64).view(np.uint64) & np.uint64(
        0xFFFFFFFF
    )
    h = seed + _P5 + np.uint64(4)
    h = h ^ (v * _P1)
    h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h)


def xxhash64_long_int_int(
    ids: np.ndarray, a: int, b: int
) -> np.ndarray:
    """Replica of ``F.xxhash64(longCol, F.lit(a), F.lit(b))`` (int literals)
    as SIGNED int64 — the dtype Spark's LongType result compares with."""
    with np.errstate(over="ignore"):
        h = hash_long(np.asarray(ids), SPARK_SEED)
        h = hash_int(int(a), h)
        h = hash_int(int(b), h)
    return h.view(np.int64)


def xxhash64_long(values: np.ndarray) -> np.ndarray:
    """Replica of single-column ``F.xxhash64(longCol)`` as signed int64."""
    with np.errstate(over="ignore"):
        h = hash_long(np.asarray(values), SPARK_SEED)
    return h.view(np.int64)


def xxhash64_long_int(values: np.ndarray, a: int) -> np.ndarray:
    """Replica of ``F.xxhash64(longCol, F.lit(a))`` (int literal)."""
    with np.errstate(over="ignore"):
        h = hash_long(np.asarray(values), SPARK_SEED)
        h = hash_int(int(a), h)
    return h.view(np.int64)


def xxhash64_long_long_int(
    src: np.ndarray, dst: np.ndarray, a: int
) -> np.ndarray:
    """Replica of ``F.xxhash64(srcCol, dstCol, F.lit(a))`` — the
    MaximalMatching edge-priority expression — as signed int64."""
    with np.errstate(over="ignore"):
        h = hash_long(np.asarray(src), SPARK_SEED)
        h = hash_long(np.asarray(dst), h)
        h = hash_int(int(a), h)
    return h.view(np.int64)
