"""Bitmap aggregate / scalar family (reference BitmapType.java,
flink-core/.../types/bitmap/, scalar fns .../runtime/functions/scalar/Bitmap*.java,
aggs .../runtime/functions/aggregate/ Bitmap*Agg).

Representation: a dense word-aligned bitset serialized as little-endian
uint64 words in a BINARY column (the moral equivalent of one roaring
container; fine for key domains that are dense-ish like surrogate ids —
the format is an implementation detail behind the functions below).

Scale design (the part that matters at 100 TB): `bitmap_build` is a
two-phase aggregate mirroring Flink's local/global split
(TwoStageOptimizedAggregateRule): phase 1 builds one partial bitmap per
(input partition × group) with `mapInPandas` — a map-side combine that
reduces the shuffle from |rows| key occurrences to |partitions × groups|
small binary blobs — and phase 2 OR-merges partials per group. The shuffle
payload is bitmaps, never raw keys.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _build_words(vals: np.ndarray) -> bytes:
    """Pack distinct non-negative int64 keys into a uint64-word bitset."""
    if len(vals) == 0:
        return b""
    vals = vals.astype(np.int64)
    words = np.zeros(int(vals.max()) // 64 + 1, dtype=np.uint64)
    np.bitwise_or.at(
        words, vals // 64, np.uint64(1) << (vals % 64).astype(np.uint64)
    )
    return words.tobytes()


def _words(b: bytes) -> np.ndarray:
    return np.frombuffer(b or b"", dtype=np.uint64)


def _pad_pair(a: bytes, b: bytes) -> tuple[np.ndarray, np.ndarray]:
    wa, wb = _words(a), _words(b)
    n = max(len(wa), len(wb))
    pa = np.zeros(n, dtype=np.uint64)
    pb = np.zeros(n, dtype=np.uint64)
    pa[: len(wa)] = wa
    pb[: len(wb)] = wb
    return pa, pb


def _popcount(words: np.ndarray) -> int:
    return int(np.unpackbits(words.view(np.uint8)).sum())


def bitmap_build(df: DataFrame, group: str, key: str, out: str = "bitmap") -> DataFrame:
    """Aggregate `key` (non-negative integer) into one bitmap per `group`.

    Two-phase: map-side partial bitmaps per input partition, then a
    groupBy-shuffle of the (small) partials OR-merged per group.
    """
    gtype = df.schema[group].dataType.simpleString()
    partial_schema = f"{group} {gtype}, partial binary"

    def local_partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = [
                (g, _build_words(sub[key].to_numpy()))
                for g, sub in pdf.groupby(group, sort=False)
            ]
            yield pd.DataFrame(rows, columns=[group, "partial"])

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        words = _words(max(pdf["partial"], key=len)).copy()
        for b in pdf["partial"]:
            w = _words(b)
            words[: len(w)] |= w
        return pd.DataFrame(
            {group: [pdf[group].iloc[0]], out: [words.tobytes()]}
        )

    partials = df.select(group, key).mapInPandas(local_partials, partial_schema)
    return partials.groupBy(group).applyInPandas(
        merge, f"{group} {gtype}, {out} binary"
    )


# Scalar functions are built lazily (pandas_udf parses its DDL return type
# against the active session, so module import must not require one).


def bitmap_cardinality(col) -> F.Column:
    @pandas_udf("long")
    def f(b: pd.Series) -> pd.Series:
        return b.map(lambda x: _popcount(_words(x)))

    return f(col)


def _set_bits_extreme(col, last: bool) -> F.Column:
    @pandas_udf("long")
    def f(b: pd.Series) -> pd.Series:
        def g(x):
            bits = np.unpackbits(_words(x).view(np.uint8), bitorder="little")
            nz = np.flatnonzero(bits)
            return int(nz[-1] if last else nz[0]) if len(nz) else None

        return b.map(g)

    return f(col)


def bitmap_min(col) -> F.Column:
    return _set_bits_extreme(col, last=False)


def bitmap_max(col) -> F.Column:
    return _set_bits_extreme(col, last=True)


def _binop(op):
    def mk(ca, cb) -> F.Column:
        @pandas_udf("binary")
        def f(a: pd.Series, b: pd.Series) -> pd.Series:
            out = []
            for x, y in zip(a, b):
                pa, pb = _pad_pair(x, y)
                out.append(op(pa, pb).tobytes())
            return pd.Series(out)

        return f(ca, cb)

    return mk


bitmap_and = _binop(np.bitwise_and)
bitmap_or = _binop(np.bitwise_or)
bitmap_xor = _binop(np.bitwise_xor)
bitmap_andnot = _binop(lambda a, b: a & ~b)


def bitmap_to_array(col) -> F.Column:
    @pandas_udf("array<long>")
    def f(b: pd.Series) -> pd.Series:
        def g(x):
            bits = np.unpackbits(_words(x).view(np.uint8), bitorder="little")
            return np.flatnonzero(bits).astype(np.int64)

        return b.map(g)

    return f(col)


def bitmap_from_array(col) -> F.Column:
    """BITMAP_FROM_ARRAY: scalar constructor from array<long>."""

    @pandas_udf("binary")
    def f(arr: pd.Series) -> pd.Series:
        return arr.map(
            lambda v: _build_words(np.unique(np.asarray(v, dtype=np.int64)))
        )

    return f(col)
