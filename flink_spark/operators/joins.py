"""Join operators the DataFrame API lacks as one-liners: interval join,
as-of (temporal) join, lookup join.

Reference semantics:
  - interval join: reference StreamExecIntervalJoin.java:86 /
    TimeIntervalJoin.java:53 — pairs (l, r) with equal keys and
    r.ts ∈ [l.ts + lower, l.ts + upper].
  - as-of join: reference StreamExecTemporalJoin.java:77 /
    TemporalRowTimeJoinOperator.java:84 — each left row matches the latest
    right row with r.ts <= l.ts per key (``FOR SYSTEM_TIME AS OF``).

Scale design: the as-of join is NOT implemented as a range join (which
degenerates to per-key cross products). It is a union + single sort:
tag both sides, union, one shuffle on the key, one per-key ordered pass
filling the "latest right row" forward (last_value IGNORE NULLS over rows
unbounded-preceding..current). Cost = one shuffle + sort of |L|+|R| —
the same asymptotic shape as a sort-merge as-of, and it parallelizes
per key group. Skewed keys can be salted upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """r.ts BETWEEN l.ts + lower AND l.ts + upper, with equi keys.

    Catalyst plans equi-keys as the shuffle keys (sort-merge/shuffled-hash)
    and applies the time band as a residual predicate — the right shape for
    scale; in streaming mode the same condition bounds state retention.
    """
    cond = None
    for lk, rk in keys:
        c = left[lk] == right[rk]
        cond = c if cond is None else cond & c
    band = (right[right_ts] >= left[left_ts] + F.expr(f"INTERVAL {lower}")) & (
        right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {upper}")
    )
    cond = band if cond is None else cond & band
    return left.join(right, cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: latest right row with right.ts <= left.ts per key.

    union-tag + ordered last_value fill — one shuffle, no range explosion.
    Ties (right.ts == left.ts) match, mirroring FOR SYSTEM_TIME AS OF
    inclusive semantics; among right rows with identical ts the one with
    the greatest ts wins deterministically via the (ts, side) sort.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (key, right_ts)]
    payload = F.struct(
        right[right_ts].alias("__rts"), *[right[c] for c in right_cols]
    )
    r = right.select(
        right[key].alias(key),
        right[right_ts].alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l = left.select(
        "*",
        left[left_ts].alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    l = l.select(*left.columns, "__ts", "__side", "__payload")
    unioned = l.unionByName(
        r.select(
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                if c != key
                else F.col(key)
                for c in left.columns
            ],
            "__ts",
            "__side",
            "__payload",
        )
    )
    # right rows (side=0) sort before left rows at equal ts → inclusive match
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__side") == 1).drop("__ts", "__side", "__payload")
    for c in right_cols:
        name = c + suffix if c in left.columns else c
        out = out.withColumn(name, F.col(f"__match.{c}"))
    rts_name = right_ts + suffix if right_ts in left.columns else right_ts
    out = out.withColumn(rts_name, F.col("__match.__rts")).drop("__match")
    return out


def _result_field_names(result_schema: str) -> list[str]:
    """Field names of an appended-columns schema string ("a INT, b
    STRING")."""
    from pyspark.sql.types import _parse_datatype_string

    return [f.name for f in _parse_datatype_string(result_schema).fields]


def _null_padded(pd, dicts: list[dict], index, names: list[str]):
    """Row dicts → a DataFrame carrying EXACTLY the result columns, with
    None (not NaN) for absent values: a lookup MISS must null-pad — the
    reference's left-join lookup contract (LookupJoinRunner pads
    unmatched rows). The naive ``pd.DataFrame(dicts)`` breaks it twice:
    an all-miss batch yields NO columns (schema-arity error), and a
    partial miss yields float NaN, which Arrow refuses to cast to an
    int/string result column (r12 model-fuzz find,
    test_lookup_join_matches_model)."""
    out = pd.DataFrame(dicts, index=index, columns=names, dtype=object)
    return out.where(pd.notna(out), None)


def lookup_join(
    stream: DataFrame,
    build_lookup,  # Callable[[pd.Series], pd.DataFrame-like dict lookups]
    key: str,
    result_schema: str,
):
    """Lookup join (reference StreamExecLookupJoin.java:82): probe an
    external system per batch of rows. Arrow-batched via mapInPandas so one
    RPC / cache probe serves a whole batch, with an executor-local cache —
    the Spark analog of Flink's LookupJoinRunner + cache.

    ``build_lookup`` receives a pandas Series of distinct keys and returns a
    dict key→row-dict. Kept generic; connectors supply the callable.
    """
    import pandas as pd  # local import: only the lookup path needs pandas

    res_names = _result_field_names(result_schema)

    def run(iterator):
        cache: dict = {}
        for pdf in iterator:
            missing = pdf[key][~pdf[key].isin(cache.keys())].drop_duplicates()
            if len(missing):
                cache.update(build_lookup(missing))
            looked = _null_padded(
                pd, [cache.get(k, {}) for k in pdf[key]], pdf.index,
                res_names,
            )
            yield pd.concat([pdf, looked], axis=1)

    def apply(df: DataFrame) -> DataFrame:
        return df.mapInPandas(run, schema=df.schema.simpleString()[7:-1] + "," + result_schema)

    return apply(stream)


def window_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    size: str,
    keys: list[tuple[str, str]],
    how: str = "inner",
) -> DataFrame:
    """Window join (reference StreamExecWindowJoin.java:70,
    WindowJoinOperator.java:57): pair rows that fall in the SAME tumbling
    window and satisfy the equi-keys.

    Both sides are windowed first, then equi-joined on
    (window_start, keys) — window equality becomes part of the shuffle
    key, so Catalyst plans a plain hash/sort-merge join and, on streams,
    Spark bounds state by the watermark because the join key embeds the
    event-time window (the documented stream-stream window-join shape).
    """
    from flink_spark.operators.windows import tumble

    lw = tumble(left, left_ts, size)
    rw = (
        tumble(right, right_ts, size)
        .withColumnRenamed("window_start", "__r_ws")
        .withColumnRenamed("window_end", "__r_we")
    )
    cond = lw["window_start"] == rw["__r_ws"]
    for lk, rk in keys:
        cond = cond & (lw[lk] == rw[rk])
    return lw.join(rw, cond, how).drop("__r_ws", "__r_we")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    id_col: str | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: the LEFT (large, skewed) side gets a
    deterministic salt from its row identity; the RIGHT (smaller) side is
    replicated once per salt value. The join key becomes (key, salt), so a
    hot key's rows spread over ``n_salts`` shuffle partitions instead of
    one straggler task.

    This is the manual form of what AQE's skew-join splitting does at
    runtime (reference: Flink's adaptive skewed join, FLIP-510 /
    AdaptiveSkewedJoinOptimizationStrategy) — useful when salting must be
    planned statically (e.g. the skew is known and AQE is off, or the
    engine's split threshold is too coarse). Results are identical to the
    plain join; the salt never leaves the operator.

    ``id_col``: column giving the left row identity for deterministic
    salting (defaults to the key itself — still effective because the
    replicated right side bounds each task at |hot key| / n_salts ONLY
    when identities differ, so pass a unique id when available).
    """
    salt_src = F.col(id_col if id_col is not None else left_key)
    lsalted = left.withColumn(
        "__salt",
        (F.conv(F.substring(F.md5(salt_src.cast("string")), 1, 15), 16, 10)
         .cast("bigint") % n_salts).cast("int"),
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    rsalted = right.withColumn("__salt", salts)
    joined = lsalted.join(
        rsalted,
        (lsalted[left_key] == rsalted[right_key])
        & (lsalted["__salt"] == rsalted["__salt"]),
    )
    return joined.drop("__salt")


def async_lookup_join(
    stream: DataFrame,
    async_lookup,  # Callable[[object], Awaitable[dict]] — one key → row dict
    key: str,
    result_schema: str,
    concurrency: int = 64,
    retry_max_attempts: int = 1,
    retry_delay_sec: float = 0.0,
    retry_on_empty: bool = False,
):
    """Async lookup join (reference AsyncLookupFunction.java,
    AsyncWaitOperator ordered mode): per Arrow batch, every DISTINCT miss
    key issues its awaitable concurrently (bounded by ``concurrency``)
    through one asyncio loop, results land in an executor-local cache,
    and rows emit in input order — Flink's ordered async I/O with caching,
    without thread pools or per-row latency stacking.

    Retry (reference ResultRetryStrategy / RetryPredicates,
    `LookupOptions.retry-strategy=fixed_delay`): ``retry_max_attempts``
    total tries per key with ``retry_delay_sec`` between them; a try
    counts as failed when the awaitable raises, or additionally when it
    returns an empty/None result with ``retry_on_empty=True`` (Flink's
    EMPTY_RESULT_PREDICATE — the late-dim-row case). The last failure's
    result stands (empty dict on exception exhaustion) — lookup misses
    null-pad, they don't kill the job."""
    import asyncio

    import pandas as pd

    res_names = _result_field_names(result_schema)

    def run(iterator):
        cache: dict = {}

        async def fetch_all(keys):
            sem = asyncio.Semaphore(concurrency)

            async def one(k):
                async with sem:
                    last_err = None
                    for attempt in range(max(1, retry_max_attempts)):
                        if attempt:
                            await asyncio.sleep(retry_delay_sec)
                        try:
                            res = await async_lookup(k)
                        except Exception as e:  # noqa: BLE001
                            last_err = e
                            continue
                        if retry_on_empty and not res:
                            continue
                        return k, res
                    if last_err is not None:
                        # a lookup that raised on EVERY attempt is a failing
                        # service, not an empty result — surface it (null-pad
                        # is reserved for genuinely empty lookups)
                        raise last_err
                    return k, {}

            return await asyncio.gather(*[one(k) for k in keys])

        for pdf in iterator:
            missing = pdf[key][~pdf[key].isin(cache.keys())].drop_duplicates()
            if len(missing):
                cache.update(dict(asyncio.run(fetch_all(list(missing)))))
            looked = _null_padded(
                pd, [cache.get(k, {}) for k in pdf[key]], pdf.index,
                res_names,
            )
            yield pd.concat([pdf, looked], axis=1)

    return stream.mapInPandas(
        run, schema=stream.schema.simpleString()[7:-1] + "," + result_schema
    )
