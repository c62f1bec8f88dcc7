"""Bitmap family (reference flink-core/.../types/bitmap/Bitmap.java,
runtime scalar Bitmap*Function.java, aggregate Bitmap*AggFunction):
Roaring interchange ser/de edge cases the gated query can't exercise at
sf0.01 — bitmap containers (cardinality > 4096), run containers, the
multi-chunk key split, unsigned ordering, TO_STRING truncation, and the
dense-representation guard."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_spark.functions import bitmap as BM
from flink_spark.functions.bitmap import (
    _build_words,
    _roaring_to_values,
    _values_to_roaring,
    _words,
)


def _roundtrip(vals):
    arr = np.asarray(sorted(set(vals)), dtype=np.uint32)
    back = _roaring_to_values(_values_to_roaring(arr))
    assert back.tolist() == arr.tolist()
    return _values_to_roaring(arr)


def test_roaring_array_container_roundtrip():
    _roundtrip([1, 2, 3, 100, 65535])


def test_roaring_bitmap_container_roundtrip():
    # > 4096 values inside one 64K chunk forces the 8192-byte bitset form
    vals = list(range(0, 60000, 7))  # 8572 values, all in chunk 0
    raw = _roundtrip(vals)
    (cookie,) = struct.unpack_from("<I", raw, 0)
    assert cookie == 12346
    # container payload is exactly one 8 KiB bitset after the headers
    assert len(raw) == 4 + 4 + 4 + 4 + 8192


def test_roaring_multi_chunk_and_unsigned_order():
    vals = [0, 1, 65536, 65537, 2**27 - 1]  # chunks 0, 1, 2047
    raw = _roundtrip(vals)
    (_, n) = struct.unpack("<II", raw[:8])
    assert n == 3


def test_roaring_run_container_parse():
    # hand-build a RUN-cookie stream: one run container [5, 5+3] ∪ [100]
    n = 1
    header = struct.pack("<I", 12347 | ((n - 1) << 16))
    run_flags = bytes([0b1])
    desc = struct.pack("<HH", 0, 5 - 1)  # key 0, cardinality 5
    body = struct.pack("<H", 2) + struct.pack("<HHHH", 5, 3, 100, 0)
    raw = header + run_flags + desc + body  # n < 4 → no offset header
    assert _roaring_to_values(raw).tolist() == [5, 6, 7, 8, 100]


def test_roaring_run_container_ending_at_chunk_max():
    # run ending exactly at 65535: uint16 arithmetic would wrap and
    # silently drop the run under NumPy 2's strict promotion
    n = 1
    header = struct.pack("<I", 12347 | ((n - 1) << 16))
    raw = (
        header + bytes([0b1]) + struct.pack("<HH", 0, 3 - 1)
        + struct.pack("<H", 1) + struct.pack("<HH", 65533, 2)
    )
    assert _roaring_to_values(raw).tolist() == [65533, 65534, 65535]


def test_roaring_guard_fires_before_materialization():
    # a stream declaring a high chunk key must be rejected from the
    # descriptor alone, before any container decodes
    raw = _values_to_roaring(np.array([2**31], dtype=np.uint32))
    with pytest.raises(ValueError, match="dense-representation bound"):
        _roaring_to_values(raw, max_value=BM._DENSE_MAX_VALUE)


def test_roaring_bad_cookie_rejected():
    with pytest.raises(ValueError, match="cookie"):
        _roaring_to_values(struct.pack("<I", 99))


def test_from_bytes_dense_guard(spark):
    raw = _values_to_roaring(np.array([2**31], dtype=np.uint32))
    df = spark.createDataFrame([(bytearray(raw),)], "b binary")
    with pytest.raises(Exception, match="dense-representation bound"):
        df.select(BM.bitmap_from_bytes("b").alias("x")).collect()


def test_to_bytes_from_bytes_spark_roundtrip(spark):
    df = spark.range(1).select(
        BM.bitmap_from_array(
            F.array(*[F.lit(v) for v in (0, 3, 64, 70000)])
        ).alias("bm")
    )
    out = df.select(
        BM.bitmap_to_array(
            BM.bitmap_from_bytes(BM.bitmap_to_bytes("bm"))
        ).alias("vals"),
        BM.bitmap_to_string("bm").alias("s"),
    ).first()
    assert list(out.vals) == [0, 3, 64, 70000]
    assert out.s == "{0,3,64,70000}"


def test_to_string_empty_and_truncation(spark):
    df = spark.range(1).select(
        BM.bitmap_from_array(F.array().cast("array<long>")).alias("empty"),
        BM.bitmap_from_array(
            F.sequence(F.lit(100000), F.lit(110000))
        ).alias("big"),
    )
    row = df.select(
        BM.bitmap_to_string("empty").alias("e"),
        BM.bitmap_to_string("big").alias("b"),
    ).first()
    assert row.e == "{}"
    assert row.b.startswith("{100000,") and row.b.endswith(",...}")
    assert len(row.b) <= BM._TO_STRING_MAX_CHARS


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            st.one_of(
                # dense low values (array containers)
                st.integers(0, 5000),
                # chunk-boundary neighborhoods
                st.integers(65530, 65545),
                st.integers(131066, 131076),
                # sparse spread across many chunks
                st.integers(0, (1 << 27) - 1),
            ),
            max_size=300,
        )
    )
    def test_roaring_roundtrip_property(vals):
        arr = np.asarray(sorted(set(vals)), dtype=np.uint32)
        back = _roaring_to_values(_values_to_roaring(arr))
        assert back.tolist() == arr.tolist()

    @settings(max_examples=100, deadline=None)
    @given(st.integers(4000, 9000), st.integers(1, 13))
    def test_roaring_container_form_boundary(n, step):
        # straddle the 4096 array/bitmap container threshold
        arr = np.arange(0, n * step, step, dtype=np.uint32)
        arr = arr[arr < (1 << 16)]  # keep inside one chunk
        back = _roaring_to_values(_values_to_roaring(arr))
        assert back.tolist() == arr.tolist()
except ImportError:  # pragma: no cover
    pass


def test_merge_aggs_or_and_xor(spark):
    rows = [
        ("g1", _build_words(np.array([1, 2, 3]))),
        ("g1", _build_words(np.array([2, 3, 4]))),
        ("g1", _build_words(np.array([3, 4, 5, 200]))),
        ("g2", _build_words(np.array([7]))),
    ]
    df = spark.createDataFrame(rows, "g string, bmp binary")
    got = {
        r.g: r
        for r in BM.bitmap_or_agg(df, "g", "bmp", "orb")
        .join(BM.bitmap_and_cardinality_agg(df, "g", "bmp", "ac"), "g")
        .join(BM.bitmap_xor_cardinality_agg(df, "g", "bmp", "xc"), "g")
        .select(
            "g", BM.bitmap_to_array("orb").alias("orv"), "ac", "xc"
        )
        .collect()
    }
    assert list(got["g1"].orv) == [1, 2, 3, 4, 5, 200]
    assert got["g1"].ac == 1  # only 3 present in all three
    # parity: 1(once),2(twice),3(thrice),4(twice),5(once),200(once)
    assert got["g1"].xc == 4
    assert list(got["g2"].orv) == [7] and got["g2"].ac == 1


def test_merge_aggs_skip_null_inputs(spark):
    # reference AbstractBitmapAndAggFunction.accumulate skips NULL
    # bitmaps (a NULL is NOT an empty bitmap — that would collapse
    # AND-merges to {}), and an all-NULL group yields NULL
    rows = [
        ("g1", _build_words(np.array([1, 2, 3]))),
        ("g1", None),
        ("g1", _build_words(np.array([2, 3, 4]))),
        ("g2", None),
        ("g2", None),
    ]
    df = spark.createDataFrame(rows, "g string, bmp binary")
    got = {
        r.g: r
        for r in BM.bitmap_and_agg(df, "g", "bmp", "ab")
        .join(BM.bitmap_and_cardinality_agg(df, "g", "bmp", "ac"), "g")
        .join(BM.bitmap_or_cardinality_agg(df, "g", "bmp", "oc"), "g")
        .join(BM.bitmap_xor_cardinality_agg(df, "g", "bmp", "xc"), "g")
        .collect()
    }
    # g1: NULL skipped → AND over the two real bitmaps = {2,3}
    assert got["g1"].ac == 2
    assert got["g1"].oc == 4
    assert got["g1"].xc == 2  # 1 and 4 appear once; 2,3 cancel
    # g2: no non-null input → NULL (not empty/0)
    assert got["g2"].ab is None
    assert got["g2"].ac is None


def test_merge_family_fused_matches_individual_aggs(spark):
    # r13 fusion: bitmap_merge_family_agg must be bit-identical to the
    # three individual aggregates on the same input — including NULL
    # skipping, all-NULL groups, and bitmaps of different word lengths.
    rows = [
        ("g1", _build_words(np.array([1, 2, 3]))),
        ("g1", None),
        ("g1", _build_words(np.array([2, 3, 4, 500]))),
        ("g2", None),
        ("g2", None),
        ("g3", _build_words(np.array([0, 64, 128]))),
    ]
    df = spark.createDataFrame(rows, "g string, bmp binary")
    fused = {
        r.g: r
        for r in BM.bitmap_merge_family_agg(
            df, "g", "bmp", or_out="orb", and_out="ac", xor_out="xc"
        ).collect()
    }
    sep = {
        r.g: r
        for r in BM.bitmap_or_agg(df, "g", "bmp", "orb")
        .join(BM.bitmap_and_cardinality_agg(df, "g", "bmp", "ac"), "g")
        .join(BM.bitmap_xor_cardinality_agg(df, "g", "bmp", "xc"), "g")
        .collect()
    }
    assert set(fused) == set(sep) == {"g1", "g2", "g3"}
    for g in fused:
        assert fused[g].orb == sep[g].orb, g
        assert fused[g].ac == sep[g].ac, g
        assert fused[g].xc == sep[g].xc, g
    assert fused["g2"].orb is None and fused["g2"].ac is None
