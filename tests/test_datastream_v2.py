"""DataStream API V2 (flink_spark/datastream_v2.py — reference
flink-datastream-api FLIP-408/409/410): partition-stream taxonomy,
ProcessFunction lifecycle, keyed state via StateManager, two-output and
two-input connects, broadcast replay order, builtin funcs staying JVM,
and window strategies mapping onto native group-bys."""

from __future__ import annotations

import pytest

import glob
import shutil
import sys

from pyspark.sql import functions as F

# the ProcessFunction classes below are defined in a test module the
# executors cannot import — ship them by value with the closures
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

from flink_spark.datastream_v2 import (
    BuiltinFuncs,
    Collector,
    ExecutionEnvironment,
    OneInputStreamProcessFunction,
    PartitionedContext,
    SessionWindowStrategy,
    StateDeclaration,
    TumblingTimeWindowStrategy,
    TwoInputBroadcastStreamProcessFunction,
    TwoInputNonBroadcastStreamProcessFunction,
    TwoOutputStreamProcessFunction,
)


class _Double(OneInputStreamProcessFunction):
    def process_record(self, record, output, ctx):
        output.collect({"k": record.k, "v2": record.v * 2})


def test_one_input_process(spark):
    env = ExecutionEnvironment.get_instance(spark)
    s = env.from_source(([(1, 10), (2, 20), (3, 30)], "k int, v int"))
    got = s.process(_Double(), "k int, v2 int").to_list()
    assert sorted(got) == [(1, 20), (2, 40), (3, 60)]


class _RunningTotal(OneInputStreamProcessFunction):
    TOTAL = StateDeclaration("total", "bigint", 0)
    N = StateDeclaration("n", "bigint", 0)

    def use_states(self):
        return [self.TOTAL, self.N]

    def process_record(self, record, output, ctx):
        sm = ctx.state_manager
        sm.update(self.TOTAL, sm.get(self.TOTAL) + record.v)
        sm.update(self.N, sm.get(self.N) + 1)
        output.collect(
            {"k": record.k, "seq": record.seq,
             "total": sm.get(self.TOTAL), "n": sm.get(self.N)}
        )


def test_keyed_process_bounded_state(spark):
    env = ExecutionEnvironment.get_instance(spark)
    rows = [(k, seq, k * 100 + seq) for k in (1, 2) for seq in range(4)]
    s = env.from_source((rows, "k int, seq int, v int"))
    got = (
        s.key_by("k")
        .process(_RunningTotal(), "k int, seq int, total bigint, n bigint",
                 order_by=["seq"])
        .to_list()
    )
    # running totals are per key, in seq order
    expect = []
    for k in (1, 2):
        tot = 0
        for seq in range(4):
            tot += k * 100 + seq
            expect.append((k, seq, tot, seq + 1))
    assert sorted(got) == sorted(expect)


@pytest.mark.slow
def test_keyed_process_streaming_state_across_batches(spark, tmp_path):
    """The declared states live in the state store: a key's total carries
    across micro-batches (FLIP-410 StateManager contract)."""
    src = tmp_path / "src"
    src.mkdir()

    def land(rows, stage):
        df = spark.createDataFrame(rows, "k int, seq int, v int")
        staging = tmp_path / f"stage_{stage}"
        df.coalesce(1).write.mode("overwrite").parquet(str(staging))
        (part,) = glob.glob(str(staging / "part-*.parquet"))
        shutil.move(part, str(src / f"{stage}.parquet"))

    land([(1, 0, 5), (1, 1, 7)], "b1")
    land([(1, 2, 11), (2, 0, 3)], "b2")
    env = ExecutionEnvironment.get_instance(spark)
    stream = (
        spark.readStream.schema("k int, seq int, v int")
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    out = (
        env.from_source(stream)
        .key_by("k")
        .process(_RunningTotal(), "k int, seq int, total bigint, n bigint",
                 order_by=["seq"])
        .to_data_frame()
    )
    q = (
        out.writeStream.format("memory").queryName("ds2_state")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.table("ds2_state").collect())
    # key 1's batch-2 row continues from the batch-1 state (5+7+11)
    assert got == [(1, 0, 5, 1), (1, 1, 12, 2), (1, 2, 23, 3), (2, 0, 3, 1)]


class _Split(TwoOutputStreamProcessFunction):
    def process_record(self, record, main, side, ctx):
        if record.v % 2 == 0:
            main.collect({"k": record.k, "v": record.v})
        else:
            side.collect({"k": record.k})


def test_two_output_process(spark):
    env = ExecutionEnvironment.get_instance(spark)
    s = env.from_source(([(1, 2), (2, 3), (3, 4)], "k int, v int"))
    main, side = s.process_two_output(_Split(), "k int, v int", "k int")
    assert sorted(main.to_list()) == [(1, 2), (3, 4)]
    assert sorted(side.to_list()) == [(2,)]


class _TagCount(TwoInputNonBroadcastStreamProcessFunction):
    def open(self, ctx):
        self.seen = 0

    def process_record_from_first(self, record, output, ctx):
        self.seen += 1
        output.collect({"src": "first", "k": record.k})

    def process_record_from_second(self, record, output, ctx):
        output.collect({"src": "second", "k": record.k})


def test_connect_and_process_two_input(spark):
    env = ExecutionEnvironment.get_instance(spark)
    a = env.from_source(([(1,), (2,)], "k int"))
    b = env.from_source(([(3,)], "k int"))
    got = a.connect_and_process(b, _TagCount(), "src string, k int").to_list()
    assert sorted(got) == [("first", 1), ("first", 2), ("second", 3)]


class _RuleFilter(TwoInputBroadcastStreamProcessFunction):
    def open(self, ctx):
        self.allowed = set()

    def process_record_from_broadcast(self, record, ctx):
        self.allowed.add(record.k)

    def process_record_from_non_broadcast(self, record, output, ctx):
        if record.k in self.allowed:
            output.collect({"k": record.k, "v": record.v})


def test_broadcast_connect(spark):
    """Broadcast records replay BEFORE the non-broadcast side on every
    partition (the reference's broadcast-state initialization order)."""
    env = ExecutionEnvironment.get_instance(spark)
    rules = env.from_source(([(1,), (3,)], "k int")).broadcast()
    data = env.from_source(
        ([(1, 10), (2, 20), (3, 30), (4, 40)], "k int, v int")
    ).shuffle()
    got = rules.connect_and_process(data, _RuleFilter(), "k int, v int")
    assert sorted(got.to_list()) == [(1, 10), (3, 30)]


class _CountAll(OneInputStreamProcessFunction):
    def open(self, ctx):
        self.n = 0

    def process_record(self, record, output, ctx):
        self.n += 1

    def close(self):
        pass


class _EmitCount(OneInputStreamProcessFunction):
    def __init__(self):
        self.n = 0

    def process_record(self, record, output, ctx):
        self.n += 1
        output.collect({"running": self.n})


def test_global_stream_single_partition(spark):
    """GlobalStream: the function observes EVERY record in one partition
    — the running count reaches the full row count exactly once."""
    env = ExecutionEnvironment.get_instance(spark)
    s = env.from_source(
        ([(i,) for i in range(100)], "k int")
    ).shuffle().global_()
    got = s.process(_EmitCount(), "running int").to_list()
    assert max(r[0] for r in got) == 100
    assert sorted(r[0] for r in got) == list(range(1, 101))


def test_builtin_funcs_stay_jvm(spark):
    env = ExecutionEnvironment.get_instance(spark)
    s = env.from_source(([(1, 10), (2, 20)], "k int, v int"))
    mapped = BuiltinFuncs.map(s, (F.col("v") * 2).alias("v2"))
    filtered = BuiltinFuncs.filter(mapped, F.col("v2") > 20)
    plan = filtered.to_data_frame()._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan and "Pandas" not in plan
    assert filtered.to_list() == [(2, 20, 40)]
    red = BuiltinFuncs.reduce(
        s.key_by("k"), F.sum("v").alias("s")
    )
    assert sorted(red.to_list()) == [(1, 10), (2, 20)]


def test_window_strategies_native(spark):
    env = ExecutionEnvironment.get_instance(spark)
    rows = [
        (1, "2024-01-01 00:10:00", 5.0),
        (1, "2024-01-01 00:50:00", 7.0),
        (1, "2024-01-01 01:10:00", 11.0),
        (2, "2024-01-01 00:20:00", 1.0),
    ]
    df = spark.createDataFrame(rows, "k int, ts string, v double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    env2 = ExecutionEnvironment.get_instance(spark)
    s = env2.from_source(df).key_by("k")
    tumb = s.window(TumblingTimeWindowStrategy("ts", "1 hour")).reduce(
        F.sum("v").alias("s")
    )
    got = {(r.k, r.window_start.hour): r.s for r in
           tumb.to_data_frame().collect()}
    assert got == {(1, 0): 12.0, (1, 1): 11.0, (2, 0): 1.0}
    plan = tumb.to_data_frame()._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan
    # k=1: 00:10 is its own session (40 min to 00:50 > the 30-min gap);
    # 00:50 + 01:10 merge (20 min gap); k=2: one singleton session
    sess = s.window(SessionWindowStrategy("ts", "30 minutes")).reduce(
        F.count("*").alias("n")
    )
    assert sorted(r.n for r in sess.to_data_frame().collect()) == [1, 1, 2]


class _BufferMatch(TwoInputNonBroadcastStreamProcessFunction):
    """Buffers input-1 rows per instance; every input-2 row reports how
    many input-1 rows this instance had already seen — the canonical
    two-input pattern that requires (a) both sides reaching the same
    task and (b) first-before-second processing order."""

    def open(self, ctx):
        self.firsts = 0

    def process_record_from_first(self, record, output, ctx):
        # each side's record arrives in its OWN schema, own dtypes
        assert record._fields == ("a", "b"), record._fields
        assert not isinstance(record.a, float), type(record.a)
        self.firsts += 1

    def process_record_from_second(self, record, output, ctx):
        assert record._fields == ("c",), record._fields
        assert not isinstance(record.c, float), type(record.c)
        output.collect({"c": record.c, "seen_first": self.firsts})


def test_connect_co_locates_and_orders_sides(spark):
    """Every task must see records from BOTH inputs (the reference
    rebalances each input across all parallel instances; a side-pure
    partition layout would make input-1 state invisible to input-2),
    with the first input fully processed before the second within a
    task. 2000 rows per side round-robined across the default
    parallelism puts both sides in every partition."""
    env = ExecutionEnvironment.get_instance(spark)
    n = 2000
    a = env.from_source(
        ([(i, f"s{i}") for i in range(n)], "a int, b string")
    )
    b = env.from_source(([(i,) for i in range(n)], "c int"))
    got = a.connect_and_process(
        b, _BufferMatch(), "c int, seen_first int"
    ).to_list()
    assert len(got) == n
    assert sorted(c for c, _seen in got) == list(range(n))
    # first-before-second + co-location: every input-2 record saw
    # input-1 state already built in its instance
    assert all(seen > 0 for _c, seen in got)


def test_keyed_streaming_order_by_spans_arrow_chunks(spark, tmp_path):
    """order_by must sort the key's WHOLE micro-batch, not each Arrow
    chunk: with maxRecordsPerBatch smaller than the group, per-chunk
    sorting would run later-chunk low-seq records after earlier-chunk
    high-seq ones and corrupt order-dependent state transitions."""
    saved = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        src = tmp_path / "src"
        src.mkdir()
        n = 50
        # land in REVERSED seq order so chunk boundaries cut across it
        df = spark.createDataFrame(
            [(1, seq, 1) for seq in reversed(range(n))],
            "k int, seq int, v int",
        )
        staging = tmp_path / "stage_b1"
        df.coalesce(1).write.mode("overwrite").parquet(str(staging))
        (part,) = glob.glob(str(staging / "part-*.parquet"))
        shutil.move(part, str(src / "b1.parquet"))
        env = ExecutionEnvironment.get_instance(spark)
        stream = (
            spark.readStream.schema("k int, seq int, v int")
            .parquet(str(src))
        )
        out = (
            env.from_source(stream)
            .key_by("k")
            .process(
                _RunningTotal(),
                "k int, seq int, total bigint, n bigint",
                order_by=["seq"],
            )
            .to_data_frame()
        )
        q = (
            out.writeStream.format("memory").queryName("ds2_chunk_order")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        got = sorted(
            tuple(r) for r in spark.table("ds2_chunk_order").collect()
        )
        assert got == [(1, seq, seq + 1, seq + 1) for seq in range(n)]
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", saved
        )
