"""Format / connector round-trips through the DDL layer (SURVEY §2.1:
FileSystemTableFactory + flink-formats csv/json/parquet/avro/orc):
CREATE TABLE WITH ('connector'='filesystem','format'=F) → INSERT INTO →
read back, value-identical to the source."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_spark.catalog import TableEnvironment
from flink_spark.sources.tables import load_table

FORMATS = ["parquet", "csv", "json", "avro", "orc"]


@pytest.fixture(scope="module")
def env(spark):
    return TableEnvironment(spark)


@pytest.fixture(scope="module")
def src_rows(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .orderBy("s_suppkey")
    )
    df.createOrReplaceTempView("fmt_src")
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip(env, src_rows, tmp_path_factory, fmt):
    # avro needs no skip: when the spark-avro jar is absent the catalog
    # falls back to the self-contained binary codec (formats/avro.py)
    path = str(tmp_path_factory.mktemp(f"fmt_{fmt}"))
    header = ", 'csv.include-header' = 'true'" if fmt == "csv" else ""
    env.execute_sql(f"""
        CREATE TABLE sink_{fmt} (
            s_suppkey BIGINT, s_name STRING, s_nationkey BIGINT,
            s_acctbal DOUBLE
        ) WITH ('connector' = 'filesystem', 'format' = '{fmt}',
                'path' = '{path}'{header})
    """)
    env.execute_sql(f"INSERT INTO sink_{fmt} SELECT * FROM fmt_src")
    got = sorted(map(tuple, env.spark.table(f"sink_{fmt}").collect()))
    assert got == src_rows


def test_insert_overwrite(env, src_rows, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fmt_ovw"))
    env.execute_sql(f"""
        CREATE TABLE sink_ovw (s_suppkey BIGINT, s_name STRING,
                               s_nationkey BIGINT, s_acctbal DOUBLE)
        WITH ('connector' = 'filesystem', 'format' = 'parquet',
              'path' = '{path}')
    """)
    env.execute_sql("INSERT INTO sink_ovw SELECT * FROM fmt_src")
    env.execute_sql("INSERT INTO sink_ovw SELECT * FROM fmt_src")
    assert env.spark.table("sink_ovw").count() == 2 * len(src_rows)
    env.execute_sql("INSERT OVERWRITE sink_ovw SELECT * FROM fmt_src")
    assert sorted(map(tuple, env.spark.table("sink_ovw").collect())) == src_rows


def test_partitioned_write(env, src_rows, tmp_path_factory, spark):
    path = str(tmp_path_factory.mktemp("fmt_part"))
    env.execute_sql(f"""
        CREATE TABLE sink_part (s_suppkey BIGINT, s_name STRING,
                                s_nationkey BIGINT, s_acctbal DOUBLE)
        WITH ('connector' = 'filesystem', 'format' = 'parquet',
              'path' = '{path}', 'partition.keys' = 's_nationkey')
    """)
    env.execute_sql("INSERT INTO sink_part SELECT * FROM fmt_src")
    import os

    dirs = [d for d in os.listdir(path) if d.startswith("s_nationkey=")]
    assert len(dirs) > 1  # hive-style partition layout on disk
    got = spark.table("sink_part").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    assert got.count() == len(src_rows)
    # partition pruning reaches the file listing
    pruned = got.filter(F.col("s_nationkey") == 3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() > 0


def test_blackhole_and_print(env, spark, capsys):
    env.execute_sql(
        "CREATE TABLE bh (x BIGINT) WITH ('connector' = 'blackhole')"
    )
    env.execute_sql("INSERT INTO bh SELECT 1 AS x")
    env.execute_sql(
        "CREATE TABLE pr (x BIGINT) WITH ('connector' = 'print')"
    )
    env.execute_sql("INSERT INTO pr SELECT 42 AS x")
    assert "42" in capsys.readouterr().out


class TestProtobuf:
    FIELDS = [
        ("event_id", 1, "int64"),
        ("event_type", 2, "string"),
        ("value", 3, "double"),
        ("flag", 4, "bool"),
    ]

    def test_roundtrip_identity(self, spark):
        from flink_spark.formats.protobuf import (
            decode_protobuf,
            encode_protobuf,
        )

        df = spark.createDataFrame(
            [
                (1, "click", 1.5, True),
                (2, "", 0.0, False),  # proto3 defaults: omitted then refilled
                (-3, "view", -2.5, True),  # negative varint (10-byte form)
            ],
            "event_id long, event_type string, value double, flag boolean",
        )
        dec = decode_protobuf(encode_protobuf(df, self.FIELDS), "pb", self.FIELDS)
        assert sorted(map(tuple, dec.collect())) == sorted(
            map(tuple, df.collect())
        )

    def test_wire_format_golden(self):
        """Bytes must be standard proto3 wire format, not a private codec:
        field 1 varint, field 2 length-delimited, field 3 fixed64."""
        import struct

        from flink_spark.formats.protobuf import _decode_row, _encode_row

        b = _encode_row(
            {"event_id": 1, "event_type": "click", "value": 1.5, "flag": True},
            self.FIELDS,
        )
        expected = (
            b"\x08\x01"                       # 1<<3|0, varint 1
            b"\x12\x05click"                  # 2<<3|2, len 5
            b"\x19" + struct.pack("<d", 1.5)  # 3<<3|1, fixed64
            + b"\x20\x01"                     # 4<<3|0, varint 1
        )
        assert b == expected
        assert _decode_row(expected, {n: (f, t) for f, n, t in self.FIELDS}) == {
            "event_id": 1, "event_type": "click", "value": 1.5, "flag": True,
        }

    def test_unknown_fields_skipped(self):
        from flink_spark.formats.protobuf import _decode_row, _encode_row

        b = _encode_row(
            {"event_id": 7, "event_type": "x", "value": 2.0, "flag": False},
            self.FIELDS,
        )
        # decoder only knows field 1 → other fields skipped, not an error
        assert _decode_row(b, {1: ("event_id", "int64")}) == {"event_id": 7}

    def test_descriptor_set_shape(self):
        """The generated FileDescriptorSet is parseable with our own wire
        reader: file entry (field 1) wrapping a FileDescriptorProto whose
        name (field 1) and syntax (field 12) match."""
        from flink_spark.formats.protobuf import (
            _read_varint,
            descriptor_set,
        )

        blob = descriptor_set("Event", self.FIELDS)
        key, i = _read_varint(blob, 0)
        assert key == (1 << 3) | 2  # FileDescriptorSet.file, LD
        ln, i = _read_varint(blob, i)
        fdp = blob[i : i + ln]
        key, j = _read_varint(fdp, 0)
        assert key == (1 << 3) | 2  # FileDescriptorProto.name
        ln2, j = _read_varint(fdp, j)
        assert fdp[j : j + ln2] == b"inline.proto"
        assert b"proto3" in fdp


# ---------------------------------------------------------------- avro ----


def test_avro_golden_bytes():
    """Hand-computed Avro binary for {a: 3, b: 'hi'} with ["null",T]
    unions: union branch 1 → zigzag varint 0x02; long 3 → 0x06;
    string = length-prefixed utf8. Proves wire compatibility with any
    standard Avro runtime without needing one installed."""
    import pandas as pd
    from pyspark.sql import types as T

    from flink_spark.formats.avro import _encode_records, _encoders

    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    records, n = _encode_records(
        pd.DataFrame({"a": [3], "b": ["hi"]}), _encoders(schema)
    )
    assert n == 1
    assert records == bytes([0x02, 0x06, 0x02, 0x04, 0x68, 0x69])
    # null branch encodes as a single zero varint, no payload
    records, _ = _encode_records(
        pd.DataFrame({"a": [None], "b": [None]}), _encoders(schema)
    )
    assert records == bytes([0x00, 0x00])


def test_avro_container_roundtrip_types(spark, tmp_path):
    """OCF round-trip across every supported type incl. nulls, timestamps
    (micros logical), dates, bytes, through multiple partitions/files."""
    import datetime

    from pyspark.sql import Row

    from flink_spark.formats.avro import read_avro, write_avro

    rows = [
        Row(i=1, l=10**12, d=1.5, f=2.5, b=True, s="x", raw=b"\x01\x02",
            ts=datetime.datetime(2024, 5, 1, 12, 30, 0, 123456),
            dt=datetime.date(2024, 5, 1)),
        Row(i=None, l=None, d=None, f=None, b=None, s=None, raw=None,
            ts=None, dt=None),
        Row(i=-7, l=-(10**12), d=-0.25, f=-8.0, b=False, s="héllo",
            raw=b"", ts=datetime.datetime(1969, 12, 31, 23, 59, 59),
            dt=datetime.date(1969, 12, 30)),
    ]
    sch = ("i int, l long, d double, f float, b boolean, s string, "
           "raw binary, ts timestamp_ntz, dt date")
    df = spark.createDataFrame(rows, sch).repartition(2)
    path = str(tmp_path / "avro_rt")
    write_avro(df, path)
    import os

    assert len([f for f in os.listdir(path) if f.endswith(".avro")]) == 2
    got = read_avro(spark, path, df.schema)
    a = sorted([tuple(r) for r in df.collect()], key=repr)
    b = sorted([tuple(r) for r in got.collect()], key=repr)
    assert a == b


def test_avro_confluent_roundtrip(spark):
    """Confluent wire framing: 0x00 magic + BE schema id + avro body,
    schema resolved through the registry stand-in."""
    from pyspark.sql import types as T

    from flink_spark.formats.avro import (
        SchemaRegistry,
        from_avro_confluent,
        to_avro_confluent,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.0), (3, None, None)], "k int, s string, v double"
    )
    reg = SchemaRegistry()
    sid = reg.register(
        T.StructType([df.schema["s"], df.schema["v"]])
    )
    enc = to_avro_confluent(df, ["s", "v"], "payload", sid)
    assert dict(enc.dtypes)["payload"] == "binary"
    first = enc.orderBy("k").select("payload").first().payload
    assert first[0] == 0 and int.from_bytes(first[1:5], "big") == sid
    dec = from_avro_confluent(enc, "payload", reg)
    got = sorted((r.k, r.s, r.v) for r in dec.collect())
    assert got == [(1, "a", 1.5), (2, "b", -2.0), (3, None, None)]


# ------------------------------------------------------- sequence-file ----


def test_sequence_file_text_roundtrip(spark, tmp_path):
    from flink_spark.formats.seqfile import (
        read_sequence_file,
        write_sequence_file,
    )

    df = spark.createDataFrame(
        [("k1", "v1"), ("k2", "v2"), ("k3", "")], "k string, v string"
    )
    path = str(tmp_path / "seq_text")
    write_sequence_file(df, path, "k", "v")
    got = sorted(map(tuple, read_sequence_file(spark, path, "k", "v").collect()))
    assert got == [("k1", "v1"), ("k2", "v2"), ("k3", "")]

    # Writables cannot hold NULL — the writer must say so clearly
    bad = spark.createDataFrame([("k", None)], "k string, v string")
    with pytest.raises(Exception, match="NULL"):
        write_sequence_file(bad, str(tmp_path / "seq_null"), "k", "v")


def test_sequence_file_binary_roundtrip(spark, tmp_path):
    from flink_spark.formats.seqfile import (
        read_sequence_file,
        write_sequence_file,
    )

    df = spark.createDataFrame(
        [("a", b"\x00\x01\xff"), ("b", b"")], "k string, v binary"
    )
    path = str(tmp_path / "seq_bin")
    write_sequence_file(df, path, "k", "v")
    got = sorted(
        map(
            tuple,
            read_sequence_file(
                spark, path, "k", "v", "string", "binary"
            ).collect(),
        )
    )
    assert got == [("a", b"\x00\x01\xff"), ("b", b"")]


def test_sequence_file_ddl_roundtrip(env, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("seq_ddl")) + "/store"
    env.execute_sql(f"""
        CREATE TABLE seq_sink (k STRING, v STRING)
        WITH ('connector' = 'filesystem', 'format' = 'sequence-file',
              'path' = '{path}')
    """)
    env.execute_sql(
        "INSERT INTO seq_sink SELECT s_name AS k, CAST(s_suppkey AS STRING) "
        "AS v FROM fmt_src"
    )
    n = env.spark.table("seq_sink").count()
    assert n == env.spark.table("fmt_src").count()


# ------------------------------------------------------------ compress ----


@pytest.mark.parametrize("fmt,codec,ext", [
    ("csv", "gzip", ".csv.gz"),
    ("json", "deflate", ".json.deflate"),
    ("parquet", "zstd", ".zstd.parquet"),
])
def test_compressed_write_roundtrip(env, src_rows, tmp_path_factory, fmt, codec, ext):
    """flink-compress CompressWriterFactory analog: the 'compression'
    table option reaches the files on disk and reads stay transparent."""
    import os

    path = str(tmp_path_factory.mktemp(f"comp_{fmt}_{codec}"))
    header = ", 'csv.include-header' = 'true'" if fmt == "csv" else ""
    env.execute_sql(f"""
        CREATE TABLE comp_{fmt}_{codec} (
            s_suppkey BIGINT, s_name STRING, s_nationkey BIGINT,
            s_acctbal DOUBLE
        ) WITH ('connector' = 'filesystem', 'format' = '{fmt}',
                'path' = '{path}', 'compression' = '{codec}'{header})
    """)
    env.execute_sql(f"INSERT INTO comp_{fmt}_{codec} SELECT * FROM fmt_src")
    files = [f for f in os.listdir(path) if not f.startswith(("_", "."))]
    assert files and all(f.endswith(ext) for f in files), files
    got = sorted(map(tuple, env.spark.table(f"comp_{fmt}_{codec}").collect()))
    assert got == src_rows


# ----------------------------------------------- avro container metadata ----


def _mk_container(spark, codec: bytes, payload: bytes, schema_json: bytes,
                  n: int):
    """Hand-build an OCF with explicit metadata (codec/schema) so the
    reader's metadata handling is exercised independently of the writer."""
    from flink_spark.formats.avro import MAGIC, _write_bytes, _write_long

    out = bytearray(MAGIC)
    _write_long(out, 2)
    _write_bytes(out, b"avro.schema")
    _write_bytes(out, schema_json)
    _write_bytes(out, b"avro.codec")
    _write_bytes(out, codec)
    _write_long(out, 0)
    sync = b"\x00" * 16
    out.extend(sync)
    _write_long(out, n)
    _write_long(out, len(payload))
    out.extend(payload)
    out.extend(sync)
    return bytes(out)


def _ab_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )


def _ab_schema_json(fields=("a", "b")) -> bytes:
    import json

    return json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": f, "type": ["null", "long" if f == "a" else
                                        "string"], "default": None}
                   for f in fields],
    }).encode()


def test_avro_container_deflate_codec(spark):
    """A standard-written deflate container decodes correctly (ADVICE r2:
    the codec metadata was previously ignored)."""
    import zlib

    import pandas as pd

    from flink_spark.formats.avro import (
        _encode_records,
        _encoders,
        _finalize_pdf,
        _read_container,
    )

    encs = _encoders(_ab_schema())
    records, n = _encode_records(
        pd.DataFrame({"a": [3, None], "b": ["hi", None]}), encs
    )
    comp = zlib.compress(records)[2:-4]  # raw deflate (RFC1951, no wrapper)
    raw = _mk_container(spark, b"deflate", comp, _ab_schema_json(), n)
    pdf = _finalize_pdf(_read_container(raw, encs), encs)
    assert list(pdf["a"]) [0] == 3 and list(pdf["b"])[0] == "hi"
    assert pdf["a"][1] is None or pdf["a"].isna()[1]


def test_avro_container_rejects_unknown_codec_and_schema_mismatch(spark):
    import pandas as pd
    import pytest

    from flink_spark.formats.avro import (
        _encode_records,
        _encoders,
        _read_container,
    )

    encs = _encoders(_ab_schema())
    records, n = _encode_records(pd.DataFrame({"a": [1], "b": ["x"]}), encs)
    bad_codec = _mk_container(spark, b"snappy", records, _ab_schema_json(), n)
    with pytest.raises(ValueError, match="unsupported container codec"):
        _read_container(bad_codec, encs)
    # writer schema with different field order must be rejected, not
    # silently misdecoded
    swapped = _mk_container(
        spark, b"null", records, _ab_schema_json(fields=("b", "a")), n
    )
    with pytest.raises(ValueError, match="do not match"):
        _read_container(swapped, encs)


def test_avro_confluent_empty_registry_raises(spark):
    import pytest

    from flink_spark.formats.avro import SchemaRegistry, from_avro_confluent

    df = spark.createDataFrame([(b"\x00",)], "payload binary")
    with pytest.raises(ValueError, match="registry is empty"):
        from_avro_confluent(df, "payload", SchemaRegistry())


def test_sequencefile_ddl_requires_two_columns(spark, tmp_path):
    import pytest

    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE seq3 (a STRING, b STRING, c STRING) WITH (
          'connector' = 'filesystem',
          'path' = '{tmp_path / "seq3"}',
          'format' = 'sequencefile'
        )
    """)
    with pytest.raises(ValueError, match="exactly two columns"):
        env.execute_sql("INSERT INTO seq3 VALUES ('k', 'v', 'extra')")
