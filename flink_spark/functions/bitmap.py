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


# -- Roaring interop + rendering (reference Bitmap.java toBytes/toString,
# -- BitmapFromBytesFunction/BitmapToBytesFunction/BitmapToStringFunction;
# -- byte layout per the public 32-bit RoaringBitmap format spec,
# -- github.com/RoaringBitmap/RoaringFormatSpec) --------------------------

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX_CARD = 4096
#: guard for the dense internal representation: a deserialized value v
#: allocates v/8 bytes of bitset, so genuinely sparse-high Roaring inputs
#: (e.g. {4294967295}) must be rejected rather than silently ballooning
#: executor memory. 1<<27 caps a single bitmap at 16 MiB of words.
_DENSE_MAX_VALUE = 1 << 27
#: BITMAP_TO_STRING truncation bound ("{1,2,3,...}" when too long)
_TO_STRING_MAX_CHARS = 32768


def _values_to_roaring(vals: np.ndarray) -> bytes:
    """Serialize sorted distinct uint32 values to portable Roaring bytes
    (always the no-run-container layout: cookie 12346, which every
    Roaring reader accepts)."""
    import struct

    vals = np.asarray(vals, dtype=np.uint32)
    hi = (vals >> np.uint32(16)).astype(np.uint16)
    lo = (vals & np.uint32(0xFFFF)).astype(np.uint16)
    keys, starts = np.unique(hi, return_index=True)
    bounds = list(starts[1:]) + [len(vals)]
    n = len(keys)
    head = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    desc = bytearray()
    containers: list[bytes] = []
    for k, s, e in zip(keys, starts, bounds):
        card = e - s
        desc += struct.pack("<HH", int(k), card - 1)
        chunk = lo[s:e]
        if card <= _ARRAY_MAX_CARD:
            containers.append(chunk.astype("<u2").tobytes())
        else:
            bits = np.zeros(8192, dtype=np.uint8)
            c = chunk.astype(np.uint32)
            np.bitwise_or.at(
                bits, c // 8, (np.uint8(1) << (c % 8).astype(np.uint8))
            )
            containers.append(bits.tobytes())
    offs = bytearray()
    pos = len(head) + len(desc) + 4 * n
    for c in containers:
        offs += struct.pack("<I", pos)
        pos += len(c)
    return bytes(head) + bytes(desc) + bytes(offs) + b"".join(containers)


def _roaring_to_values(b: bytes, max_value: int | None = None) -> np.ndarray:
    """Parse portable 32-bit Roaring bytes (both cookies, array/bitmap/run
    containers) to a sorted uint32 value array. ``max_value`` rejects
    streams whose descriptor keys imply values beyond it BEFORE any
    container decodes — the memory guard must fire pre-materialization."""
    import struct

    if len(b) < 4:
        return np.empty(0, dtype=np.uint32)
    (first,) = struct.unpack_from("<I", b, 0)
    cookie = first & 0xFFFF
    if cookie == _SERIAL_COOKIE_RUN:
        n = (first >> 16) + 1
        run_bitmap = np.frombuffer(b, dtype=np.uint8, count=(n + 7) // 8,
                                   offset=4)
        pos = 4 + (n + 7) // 8
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", b, 4)
        run_bitmap = np.zeros((n + 7) // 8, dtype=np.uint8)
        pos = 8
        has_offsets = True
    else:
        raise ValueError(
            f"BITMAP_FROM_BYTES: not a 32-bit Roaring stream "
            f"(cookie {cookie})"
        )
    desc = np.frombuffer(b, dtype="<u2", count=2 * n, offset=pos)
    keys, cards = desc[0::2].astype(np.uint32), desc[1::2].astype(np.int64) + 1
    if max_value is not None and len(keys) and (
        (int(keys.max()) << 16) > max_value
    ):
        raise ValueError(
            f"BITMAP_FROM_BYTES: stream declares values up to chunk "
            f"{int(keys.max())} (≥ {int(keys.max()) << 16}), beyond the "
            f"dense-representation bound {max_value}"
        )
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # offsets are redundant for sequential parsing
    out: list[np.ndarray] = []
    for i in range(n):
        is_run = bool(run_bitmap[i // 8] & (1 << (i % 8)))
        if is_run:
            (nruns,) = struct.unpack_from("<H", b, pos)
            pos += 2
            runs = np.frombuffer(b, dtype="<u2", count=2 * nruns, offset=pos)
            pos += 4 * nruns
            # int() the uint16 scalars: a run ending at 65535 would
            # overflow uint16 arithmetic (s + ln + 1 → 0) and silently
            # drop the run under NumPy 2's strict promotion
            los = np.concatenate(
                [
                    np.arange(int(s), int(s) + int(ln) + 1, dtype=np.uint32)
                    for s, ln in zip(runs[0::2], runs[1::2])
                ]
            ) if nruns else np.empty(0, dtype=np.uint32)
        elif cards[i] > _ARRAY_MAX_CARD:
            bits = np.frombuffer(b, dtype=np.uint8, count=8192, offset=pos)
            pos += 8192
            los = np.flatnonzero(
                np.unpackbits(bits, bitorder="little")
            ).astype(np.uint32)
        else:
            los = np.frombuffer(
                b, dtype="<u2", count=int(cards[i]), offset=pos
            ).astype(np.uint32)
            pos += 2 * int(cards[i])
        out.append((keys[i] << np.uint32(16)) | los)
    return np.concatenate(out) if out else np.empty(0, dtype=np.uint32)


def bitmap_to_bytes(col) -> F.Column:
    """BITMAP_TO_BYTES: render the bitmap in the public 32-bit Roaring
    interchange format (reference BitmapToBytesFunction.java)."""

    @pandas_udf("binary")
    def f(b: pd.Series) -> pd.Series:
        def g(x):
            if x is None:
                return None
            bits = np.unpackbits(_words(x).view(np.uint8), bitorder="little")
            return _values_to_roaring(np.flatnonzero(bits))

        return b.map(g)

    return f(col)


def bitmap_from_bytes(col) -> F.Column:
    """BITMAP_FROM_BYTES: parse 32-bit Roaring interchange bytes
    (reference BitmapFromBytesFunction.java). Values above
    ``_DENSE_MAX_VALUE`` are rejected: this engine's bitmap payload is a
    dense word bitset (see module docstring), so an adversarially sparse
    Roaring input must fail loudly instead of allocating value/8 bytes."""

    @pandas_udf("binary")
    def f(b: pd.Series) -> pd.Series:
        def g(x):
            if x is None:
                return None
            vals = _roaring_to_values(bytes(x), max_value=_DENSE_MAX_VALUE)
            if len(vals) and int(vals.max()) > _DENSE_MAX_VALUE:
                raise ValueError(
                    f"BITMAP_FROM_BYTES: value {int(vals.max())} exceeds the "
                    f"dense-representation bound {_DENSE_MAX_VALUE}"
                )
            return _build_words(vals.astype(np.int64))

        return b.map(g)

    return f(col)


def bitmap_to_string(col) -> F.Column:
    """BITMAP_TO_STRING: '{v1,v2,...}' in unsigned order, truncated with
    a trailing '...' when too long (reference Bitmap.java toString
    contract; examples '{}', '{1,2,3,4,5}', '{1,2,3,...}')."""

    @pandas_udf("string")
    def f(b: pd.Series) -> pd.Series:
        def g(x):
            if x is None:
                return None
            bits = np.unpackbits(_words(x).view(np.uint8), bitorder="little")
            vals = np.flatnonzero(bits)
            body = ",".join(map(str, vals))
            if len(body) + 2 > _TO_STRING_MAX_CHARS:
                body = body[: _TO_STRING_MAX_CHARS - 5]
                body = body[: body.rfind(",") + 1] + "..."
            return "{" + body + "}"

        return b.map(g)

    return f(col)


# -- bitmap-merging aggregates (reference BitmapOrAggFunction /
# -- BitmapAndAggFunction / BitmapXorAggFunction and the *_CARDINALITY_AGG
# -- twins; BitmapBuildCardinalityAggFunction) ----------------------------


def _merge_agg(op_name: str):
    ops = {
        "or": lambda acc, w: np.bitwise_or(acc, w),
        "and": lambda acc, w: np.bitwise_and(acc, w),
        "xor": lambda acc, w: np.bitwise_xor(acc, w),
    }
    op = ops[op_name]

    def agg(df: DataFrame, group: str, col: str, out: str = "bitmap",
            cardinality: bool = False) -> DataFrame:
        gtype = df.schema[group].dataType.simpleString()
        out_type = "bigint" if cardinality else "binary"

        def merge(pdf: pd.DataFrame) -> pd.DataFrame:
            # NULL bitmaps are SKIPPED, not treated as empty (reference
            # AbstractBitmapAndAggFunction.accumulate:102 returns on null
            # input — an empty-bitmap reading would collapse AND-merges
            # to {}), and a group with no non-null input yields NULL
            # (getValue: `acc.bitmap == null ? null : ...`).
            vals = [x for x in pdf[col] if x is not None]
            if not vals:
                val = None
            else:
                n = max(len(_words(x)) for x in vals)
                acc = None
                for x in vals:
                    w = np.zeros(n, dtype=np.uint64)
                    ww = _words(x)
                    w[: len(ww)] = ww
                    acc = w if acc is None else op(acc, w)
                val = _popcount(acc) if cardinality else acc.tobytes()
            return pd.DataFrame({group: [pdf[group].iloc[0]], out: [val]})

        return df.select(group, col).groupBy(group).applyInPandas(
            merge, f"{group} {gtype}, {out} {out_type}"
        )

    return agg


bitmap_or_agg = _merge_agg("or")
bitmap_and_agg = _merge_agg("and")
bitmap_xor_agg = _merge_agg("xor")


def bitmap_merge_family_agg(
    df: DataFrame,
    group: str,
    col: str,
    or_out: str = "orb",
    and_out: str = "and_card",
    xor_out: str = "xor_card",
) -> DataFrame:
    """Fused OR/AND/XOR merge: one grouped pass computing the OR bitmap
    plus the AND- and XOR-cardinalities together.

    Optimization fusion of ``bitmap_or_agg`` + ``bitmap_and_cardinality_agg``
    + ``bitmap_xor_cardinality_agg`` over the SAME input: calling the three
    separately re-executes the (expensive) upstream build lineage per call
    and shuffles the per-group partials three times — Spark does not reuse
    exchanges across separate ``applyInPandas`` branches (PythonUDF
    expressions never canonicalize equal). Per-group semantics are
    bit-identical to the individual aggregates: NULL inputs are skipped
    (never read as empty — an empty bitmap would collapse AND to {}), an
    all-NULL group yields NULL for all three outputs, and the merge ops are
    associative/commutative so fold order cannot change the result.
    """
    gtype = df.schema[group].dataType.simpleString()

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = [x for x in pdf[col] if x is not None]
        if not vals:
            orv, andc, xorc = None, None, None
        else:
            n = max(len(_words(x)) for x in vals)
            acc_or = acc_and = acc_xor = None
            for x in vals:
                w = np.zeros(n, dtype=np.uint64)
                ww = _words(x)
                w[: len(ww)] = ww
                if acc_or is None:
                    acc_or, acc_and, acc_xor = w, w.copy(), w.copy()
                else:
                    acc_or |= w
                    acc_and &= w
                    acc_xor ^= w
            orv = acc_or.tobytes()
            andc = _popcount(acc_and)
            xorc = _popcount(acc_xor)
        return pd.DataFrame(
            {
                group: [pdf[group].iloc[0]],
                or_out: [orv],
                and_out: [andc],
                xor_out: [xorc],
            }
        )

    return df.select(group, col).groupBy(group).applyInPandas(
        merge,
        f"{group} {gtype}, {or_out} binary, {and_out} bigint, "
        f"{xor_out} bigint",
    )


def bitmap_or_cardinality_agg(df, group, col, out="card"):
    """BITMAP_OR_CARDINALITY_AGG → BIGINT."""
    return bitmap_or_agg(df, group, col, out, cardinality=True)


def bitmap_and_cardinality_agg(df, group, col, out="card"):
    """BITMAP_AND_CARDINALITY_AGG → BIGINT."""
    return bitmap_and_agg(df, group, col, out, cardinality=True)


def bitmap_xor_cardinality_agg(df, group, col, out="card"):
    """BITMAP_XOR_CARDINALITY_AGG → BIGINT."""
    return bitmap_xor_agg(df, group, col, out, cardinality=True)


def bitmap_build_cardinality_agg(
    df: DataFrame, group: str, key: str, out: str = "card"
) -> DataFrame:
    """BITMAP_BUILD_CARDINALITY_AGG: build then 64-bit cardinality —
    same two-phase shape as bitmap_build (map-side partial bitmaps,
    bitmap-payload shuffle), popcount on the merged result."""
    built = bitmap_build(df, group, key, out="__bmp")
    return built.select(group, bitmap_cardinality("__bmp").alias(out))
