"""Changelog (retraction) layer: the op-column protocol plus the stateful
operators that produce/consume it.

Flink models a Table over a stream as a *changelog*: each row carries a
RowKind of +I/-U/+U/-D (reference flink-core/.../types/RowKind.java:25-52,
ChangelogMode.java:76-103). Spark has no native equivalent (SURVEY §1.1 —
the hardest semantic gap), so we encode the kind in an explicit ``op``
string column and implement the changelog-producing operators as keyed
stateful processors (``applyInPandasWithState`` — Arrow-batched, one state
row per key in the state store; the Spark analog of Flink's keyed state,
reference KeyedStateBackend.java:36):

  - ``changelog_normalize``  ↔ StreamExecChangelogNormalize.java:81
    (upsert stream → retract stream: emit -U of the previous version).
  - ``streaming_topn``       ↔ StreamExecRank.java:93 /
    RetractableTopNFunction.java:56 (Top-N with retractions as ranks shift).
  - ``dedup_keep_first``     ↔ StreamExecDeduplicate.java:94 keep-first
    (insert-only output; later duplicates are absorbed).
  - ``drop_update_before``   ↔ StreamExecDropUpdateBefore /
    DropUpdateBeforeFunction.java (upsert consumers don't need -U).

Determinism: within a micro-batch, rows of a key are processed in
``seq_cols`` order (event time + id), not arrival order — so results are
reproducible across partitionings and match the SQL oracles.

Scale: state is partitioned by the grouping key and lives in the state
store (RocksDB provider in production). Per-key state is O(1) rows for
normalize / dedup and O(N) for Top-N, independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OP_INSERT = "+I"
OP_UPDATE_BEFORE = "-U"
OP_UPDATE_AFTER = "+U"
OP_DELETE = "-D"

OP_FIELD = StructField("op", StringType(), False)


def _with_op(schema: StructType) -> StructType:
    return StructType([OP_FIELD, *schema.fields])


def changelog_normalize(
    stream: DataFrame, key_cols: list[str], seq_cols: list[str]
) -> DataFrame:
    """Upsert stream → retract stream (+I first version, then -U/+U pairs).

    Keeps the last row per key in state; each new version emits the -U of
    its predecessor. Required in front of retract-sensitive aggregations
    when the source is CDC/upsert — exactly where Flink's planner inserts
    ChangelogNormalize.
    """
    import pandas as pd

    schema = stream.schema
    cols = schema.fieldNames()

    def fn(key, pdfs, state):
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(seq_cols, kind="mergesort")[cols]
        prev = tuple(state.get) if state.exists else None
        out = []
        for row in pdf.itertuples(index=False, name=None):
            if prev is None:
                out.append((OP_INSERT, *row))
            else:
                out.append((OP_UPDATE_BEFORE, *prev))
                out.append((OP_UPDATE_AFTER, *row))
            prev = row
        if prev is not None:
            state.update(prev)
        yield pd.DataFrame(out, columns=["op", *cols])

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, _with_op(schema), schema, "append", GroupStateTimeout.NoTimeout
    )


def dedup_keep_first(
    stream: DataFrame, key_cols: list[str], seq_cols: list[str]
) -> DataFrame:
    """Event-time keep-first dedup (deterministic, unlike arrival-order
    ``dropDuplicates``): first row by ``seq_cols`` per key wins; later
    duplicates are absorbed. Insert-only output."""
    import pandas as pd

    schema = stream.schema
    cols = schema.fieldNames()
    state_schema = StructType([StructField("seen", IntegerType(), True)])

    def fn(key, pdfs, state):
        if state.exists:
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        first = pdf.sort_values(seq_cols, kind="mergesort").head(1)[cols]
        state.update((1,))
        yield first

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def group_agg_retract(
    stream: DataFrame,
    key_cols: list[str],
    value_col: str,
    seq_cols: list[str],
) -> DataFrame:
    """Retracting streaming group aggregation (reference
    StreamExecGroupAggregate.java / GroupAggFunction.java:140: each
    arriving row updates the key's accumulator and emits the retraction
    pair of the aggregate row — +I for the key's first value, then
    -U(old agg)/+U(new agg) per update).

    Aggregates COUNT(*) and SUM(``value_col``) (an integer column —
    integer accumulators keep the emission sequence integer-exact, the
    same discipline as the state-reader gate). Rows are processed in
    ``seq_cols`` order within a batch, so the emitted -U/+U sequence is
    deterministic and the whole changelog gets an exact prefix-sum SQL
    oracle. State per key = (count, sum) — O(1), exactly the reference's
    accumulator row."""
    import pandas as pd

    schema = stream.schema
    cols = schema.fieldNames()
    out_schema = StructType(
        [
            OP_FIELD,
            *[schema[c] for c in key_cols],
            StructField("cnt", LongType(), False),
            StructField("total", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("cnt", LongType(), True),
            StructField("total", LongType(), True),
        ]
    )

    def fn(key, pdfs, state):
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(seq_cols, kind="mergesort")[cols]
        cnt, total = state.get if state.exists else (0, 0)
        out = []
        for v in pdf[value_col]:
            old = (cnt, total)
            cnt, total = cnt + 1, total + int(v)
            if old[0] == 0:
                out.append((OP_INSERT, *key, cnt, total))
            else:
                out.append((OP_UPDATE_BEFORE, *key, *old))
                out.append((OP_UPDATE_AFTER, *key, cnt, total))
        state.update((cnt, total))
        yield pd.DataFrame(
            out, columns=["op", *key_cols, "cnt", "total"]
        )

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def group_agg_retract_ttl(
    stream: DataFrame,
    key_cols: list[str],
    value_col: str,
    ts_col: str,
    tiebreak_cols: list[str],
    ttl: str,
) -> DataFrame:
    """Retracting group aggregation with state TTL (reference
    StateTtlConfig OnReadAndWrite on StreamExecGroupAggregate /
    `table.exec.state.ttl`): the key's accumulator refreshes on every
    sighting; once the event-time gap since the last sighting exceeds
    ``ttl`` the state is expired — dropped SILENTLY, with no retraction
    (exactly Flink's TTL semantics) — and the next row re-emits as a
    fresh +I with a restarted count.

    Closed form (what makes the oracle exact): TTL gaps split each key's
    timeline into islands (LAG(ts) IS NULL OR ts - LAG(ts) > ttl starts
    one); within an island the emissions are the prefix-sum sequence of
    :func:`group_agg_retract`."""
    import pandas as pd

    ttl_us = int(pd.Timedelta(ttl).value // 1000)
    schema = stream.schema
    cols = schema.fieldNames()
    out_schema = StructType(
        [
            OP_FIELD,
            *[schema[c] for c in key_cols],
            StructField("cnt", LongType(), False),
            StructField("total", LongType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("cnt", LongType(), True),
            StructField("total", LongType(), True),
            StructField("last_seen_us", LongType(), True),
        ]
    )

    def fn(key, pdfs, state):
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values([ts_col, *tiebreak_cols],
                              kind="mergesort")[cols]
        cnt, total, last = state.get if state.exists else (0, 0, None)
        ts_us = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000
        out = []
        for v, t in zip(pdf[value_col], ts_us):
            if last is not None and t - last > ttl_us:
                cnt, total = 0, 0  # silent expiry, no retraction
            old = (cnt, total)
            cnt, total = cnt + 1, total + int(v)
            if old[0] == 0:
                out.append((OP_INSERT, *key, cnt, total))
            else:
                out.append((OP_UPDATE_BEFORE, *key, *old))
                out.append((OP_UPDATE_AFTER, *key, cnt, total))
            last = int(t)  # OnReadAndWrite: every sighting refreshes
        state.update((cnt, total, last))
        yield pd.DataFrame(
            out, columns=["op", *key_cols, "cnt", "total"]
        )

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_topn(
    stream: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    n: int,
    ascending: list[bool] | None = None,
) -> DataFrame:
    """Streaming Top-N emitting a changelog of rank movements.

    State = the current top rows (column-wise arrays). Per batch: merge new
    rows, re-rank; emit -D for rows leaving the Top-N, +I for rows entering
    and -U/+U pairs for surviving rows whose rank moved (rank in payload).
    ``ascending`` gives per-column sort direction (default all-descending);
    pass an ascending id tiebreak for determinism.
    """
    import pandas as pd

    asc = ascending if ascending is not None else [False] * len(order_cols)
    schema = stream.schema
    cols = schema.fieldNames()
    state_schema = StructType(
        [StructField(f.name, ArrayType(f.dataType), True) for f in schema.fields]
    )
    out_schema = StructType(
        [OP_FIELD, StructField("rank", IntegerType(), False), *schema.fields]
    )

    def rank(pdf):
        return (
            pdf.sort_values(order_cols, ascending=asc, kind="mergesort")
            .head(n)
            .reset_index(drop=True)
        )

    def keyed(pdf):
        # Key on (row, occurrence_index) so duplicate identical rows inside
        # the Top-N stay distinct entries — keying on the bare row tuple
        # would collapse ties and lose +I/-D emissions for the duplicates.
        counts: dict = {}
        out = {}
        for i, r in enumerate(pdf.itertuples(index=False, name=None)):
            occ = counts.get(r, 0)
            counts[r] = occ + 1
            out[(r, occ)] = i + 1
        return out

    def fn(key, pdfs, state):
        new = pd.concat(list(pdfs), ignore_index=True)[cols]
        if state.exists:
            stored = state.get
            old = pd.DataFrame({c: list(stored[i]) for i, c in enumerate(cols)})
        else:
            old = pd.DataFrame({c: pd.Series(dtype=new[c].dtype) for c in cols})
        ranked = rank(pd.concat([old, new], ignore_index=True))
        state.update(tuple(list(ranked[c]) for c in cols))
        old_ranks = keyed(rank(old)) if len(old) else {}
        new_ranks = keyed(ranked)
        out = []
        for (row, _occ), rk in old_ranks.items():
            if (row, _occ) not in new_ranks:
                out.append((OP_DELETE, rk, *row))
        for (row, _occ), rk in new_ranks.items():
            if (row, _occ) not in old_ranks:
                out.append((OP_INSERT, rk, *row))
            elif old_ranks[(row, _occ)] != rk:
                out.append((OP_UPDATE_BEFORE, old_ranks[(row, _occ)], *row))
                out.append((OP_UPDATE_AFTER, rk, *row))
        yield pd.DataFrame(out, columns=["op", "rank", *cols])

    return stream.groupBy(*partition_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def drop_update_before(changelog: DataFrame) -> DataFrame:
    """Strip -U rows for upsert-capable consumers."""
    return changelog.filter(F.col("op") != OP_UPDATE_BEFORE)


def materialize(changelog: DataFrame, key_cols: list[str], seq_cols: list[str]) -> DataFrame:
    """Batch-fold a collected changelog back to a table: the latest +I/+U
    version (by ``seq_cols``) per key wins. (Test/sink helper — the
    foreachBatch MERGE upsert sink applies the same fold per batch.)"""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in seq_cols])
    return (
        drop_update_before(changelog)
        .filter(F.col("op") != OP_DELETE)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "op")
    )


def dedup_keep_first_ttl(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str],
    ttl: str,
) -> DataFrame:
    """Keep-first dedup with state TTL (reference StateTtlConfig
    OnReadAndWrite + `table.exec.state.ttl` on StreamExecDeduplicate):
    the key's state refreshes on every sighting, and once the event-time
    gap since the last sighting exceeds ``ttl`` the state is considered
    expired — the next row re-emits as a fresh "first".

    Equivalent closed form (what makes the oracle exact): emit a row iff
    it has no predecessor for the key within ``ttl``
    (LAG(ts) IS NULL OR ts - LAG(ts) > ttl)."""
    import pandas as pd

    ttl_us = int(pd.Timedelta(ttl).value // 1000)
    schema = stream.schema
    cols = schema.fieldNames()
    state_schema = StructType([StructField("last_seen_us", LongType(), True)])

    def fn(key, pdfs, state):
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values([ts_col, *tiebreak_cols], kind="mergesort")[cols]
        last = state.get[0] if state.exists else None
        keep = []
        ts_us = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000
        for i, t in enumerate(ts_us):
            if last is None or t - last > ttl_us:
                keep.append(i)
            last = int(t)  # OnReadAndWrite: every sighting refreshes
        state.update((last,))
        if keep:
            yield pdf.iloc[keep]

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_topn_ttl(
    stream: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    n: int,
    ts_col: str,
    ttl: str,
    ascending: list[bool] | None = None,
) -> DataFrame:
    """Streaming Top-N with state TTL (reference StateTtlConfig on
    StreamExecRank / `table.exec.state.ttl`): a partition whose event-time
    quiet gap exceeds ``ttl`` has its leaderboard state dropped — silently,
    with no retractions, exactly Flink's TTL semantics — and the next row
    starts a fresh board.

    Closed form (what makes the oracle exact): TTL gaps split each
    partition's timeline into islands; the materialized fold of the
    changelog is the union over islands of each island's final top-n
    (expired boards were emitted and never retracted).

    Rows are processed in event-time order inside each batch, so expiry
    is arrival-schedule-independent; state per key is the board (≤ n
    rows) plus one timestamp."""
    import pandas as pd

    asc = ascending if ascending is not None else [False] * len(order_cols)
    ttl_us = int(pd.Timedelta(ttl).value // 1000)
    schema = stream.schema
    cols = schema.fieldNames()
    state_schema = StructType(
        [StructField(f.name, ArrayType(f.dataType), True) for f in schema.fields]
        + [StructField("last_us", LongType(), True)]
    )
    out_schema = StructType(
        [OP_FIELD, StructField("rank", IntegerType(), False), *schema.fields]
    )

    def rank(pdf):
        return (
            pdf.sort_values(order_cols, ascending=asc, kind="mergesort")
            .head(n)
            .reset_index(drop=True)
        )

    def keyed(pdf):
        counts: dict = {}
        out = {}
        for i, r in enumerate(pdf.itertuples(index=False, name=None)):
            occ = counts.get(r, 0)
            counts[r] = occ + 1
            out[(r, occ)] = i + 1
        return out

    def diffs(old, new):
        old_ranks = keyed(old) if len(old) else {}
        new_ranks = keyed(new)
        out = []
        for (row, occ), rk in old_ranks.items():
            if (row, occ) not in new_ranks:
                out.append((OP_DELETE, rk, *row))
        for (row, occ), rk in new_ranks.items():
            if (row, occ) not in old_ranks:
                out.append((OP_INSERT, rk, *row))
            elif old_ranks[(row, occ)] != rk:
                out.append((OP_UPDATE_BEFORE, old_ranks[(row, occ)], *row))
                out.append((OP_UPDATE_AFTER, rk, *row))
        return out

    def fn(key, pdfs, state):
        new = pd.concat(list(pdfs), ignore_index=True)[cols]
        new = new.sort_values(
            [ts_col, *[c for c in cols if c != ts_col]], kind="mergesort"
        ).reset_index(drop=True)
        if state.exists:
            stored = state.get
            board = pd.DataFrame(
                {c: list(stored[i]) for i, c in enumerate(cols)}
            )
            last_us = stored[len(cols)]
        else:
            board = pd.DataFrame(
                {c: pd.Series(dtype=new[c].dtype) for c in cols}
            )
            last_us = None
        ts_us = pd.to_datetime(new[ts_col]).astype("int64") // 1000
        # split the batch at TTL gaps (vs the running last-activity time)
        breaks = [0]
        prev = last_us
        for i, t in enumerate(ts_us):
            if prev is not None and t - prev > ttl_us:
                breaks.append(i)
            prev = int(t)
        breaks.append(len(new))
        out = []
        for bi in range(len(breaks) - 1):
            lo, hi = breaks[bi], breaks[bi + 1]
            if lo == hi:
                continue
            seg = new.iloc[lo:hi]
            # any segment after the first begins at a TTL gap (a gap on
            # the very first row shows up as a duplicate break at 0,
            # making the pre-gap segment empty and skipped above)
            if bi > 0:
                board = board.iloc[0:0]  # TTL drop: no retractions
            merged = rank(pd.concat([board, seg], ignore_index=True))
            out.extend(diffs(rank(board) if len(board) else board, merged))
            board = merged
        if len(ts_us):
            last_us = int(ts_us.iloc[-1])
        state.update(tuple(list(board[c]) for c in cols) + (last_us,))
        yield pd.DataFrame(out, columns=["op", "rank", *cols])

    return stream.groupBy(*partition_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
