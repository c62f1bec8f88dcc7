"""Streaming CEP: the batch NFA (operators/cep.py) run incrementally over
a watermarked stream (reference StreamExecMatch.java:61, CepOperator.java —
NFA state + event-time timers; watermark advance triggers pruning/matching).

Finality rule: a match attempt starting at row *r* is decidable once
``r.ts + within ≤ watermark`` — by the watermark contract no future row
can still land inside r's window, so running the batch matcher on the
buffered prefix gives the same result it would give on the complete
stream. Attempts whose window is still open stay buffered (with their
row tail) and are re-tried when the watermark advances (event-time
timeout, exactly Flink's CepOperator watermark timer). ``within()`` is
therefore REQUIRED — the same condition Flink needs to prune NFA state.

Scale: per-key state is only the undecided suffix (bounded by the
``within`` span × per-key event rate), identical to Flink's pruned
shared-buffer; keys are shuffled once to their state partition.
"""

from __future__ import annotations

import base64
import pickle

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from flink_spark.operators.cep import (
    SKIP_PAST_LAST_ROW,
    Pattern,
    _match_from,
    _span_to_timedelta,
)


def _row_ms(ts) -> int:
    """Event time of a buffered row in epoch-ms (wall-clock for tz-naive,
    UTC for tz-aware — consistent within one pipeline)."""
    import pandas as pd

    return int(pd.Timestamp(ts).value // 1_000_000)


def advance_prefix(
    rows, steps, within_td, wm_ts, skip, n_matches, ts_col,
    ttl_ms=None, prev_ms=None,
):
    """Pure incremental step: given the undecided row buffer (ts-sorted
    dict records), emit every match whose start window is closed by
    ``wm_ts``; return (emitted, first_undecided_index, n_matches,
    prev_ms).

    ``ttl_ms`` (state TTL, reference StateTtlConfig): when the event-time
    gap between consecutive rows of the key exceeds the TTL, the match
    counter restarts — expiry is defined on event-time gaps so results
    are arrival-schedule-independent. ``prev_ms`` carries the last
    *decided* row's event time (epoch ms) across invocations.

    Factored out of the stateful processor so the finality rule is
    property-testable without Spark (tests/test_cep_stream_model.py)."""
    out = []
    i, n = 0, len(rows)
    while i < n:
        t0 = rows[i][ts_col]
        if getattr(t0, "tzinfo", None) is None and getattr(wm_ts, "tzinfo", None) is not None:
            t0 = t0.tz_localize(wm_ts.tzinfo)
        if t0 + within_td > wm_ts:
            break  # window still open → undecidable; later rows too
        if (
            ttl_ms is not None
            and prev_ms is not None
            and _row_ms(rows[i][ts_col]) - prev_ms > ttl_ms
        ):
            n_matches = 0  # TTL expired between rows → fresh numbering
        m = _match_from(rows, steps, i, within_td, ts_col)
        if m is None:
            prev_ms = _row_ms(rows[i][ts_col])
            i += 1
            continue
        n_matches += 1
        for seq_no, (ri, var) in enumerate(m, start=1):
            out.append(
                {"match_id": n_matches, "var": var, "seq_no": seq_no, **rows[ri]}
            )
        i = (max(ri for ri, _ in m) + 1) if skip == SKIP_PAST_LAST_ROW else i + 1
        prev_ms = _row_ms(rows[i - 1][ts_col])
    return out, i, n_matches, prev_ms


def stream_match_pattern(
    stream: DataFrame,
    pattern: Pattern,
    key_cols: list[str],
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
    skip: str = SKIP_PAST_LAST_ROW,
    state_ttl: str | None = None,
) -> DataFrame:
    """Streaming twin of ``match_pattern`` — same output columns
    (match_id, var, seq_no + input), same match semantics on the decided
    prefix; matches whose window is still open at stream end stay pending.

    ``state_ttl`` (reference StateTtlConfig / `table.exec.state.ttl` on
    StreamExecMatch): match numbering restarts after an event-time gap
    larger than the TTL, and an idle key's whole state row is REMOVED by
    an event-time timer once the watermark passes last-activity + 2×TTL
    (the extra TTL dominates the watermark delay, so a late row can never
    observe removed-but-not-expired state; matches never span a TTL gap
    because ``within`` ≤ TTL is required)."""
    import pandas as pd

    if not pattern.within_span:
        raise ValueError("streaming CEP requires Pattern.within() "
                         "(unbounded patterns cannot prune state)")
    within_td = _span_to_timedelta(pattern.within_span)
    ttl_ms = (
        int(pd.Timedelta(state_ttl).value // 1_000_000) if state_ttl else None
    )
    if ttl_ms is not None and within_td.value // 1_000_000 > ttl_ms:
        raise ValueError("state_ttl must be >= the pattern's within() span")
    steps = pattern.steps
    order_cols = order_cols or [ts_col]
    cols = stream.schema.fieldNames()
    out_schema = StructType(
        [
            StructField("match_id", LongType(), False),
            StructField("var", StringType(), False),
            StructField("seq_no", LongType(), False),
            *stream.schema.fields,
        ]
    )
    state_schema = StructType(
        [
            StructField("n_matches", LongType(), False),
            StructField("prev_ms", LongType(), True),
            StructField("buf", StringType(), False),
        ]
    )

    def fn(key, pdfs, state):
        chunks = [p[cols] for p in pdfs if len(p)]
        if state.exists:
            n_matches, prev_ms = state.get[0], state.get[1]
            chunks.append(pickle.loads(base64.b64decode(state.get[2])))
        else:
            n_matches, prev_ms = 0, None
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                order_cols, kind="mergesort"
            )
        else:
            pdf = pd.DataFrame(columns=cols)
        wm = state.getCurrentWatermarkMs()
        wm_ts = pd.Timestamp(wm, unit="ms", tz="UTC")
        rows = pdf.to_dict("records")
        out, i, n_matches, prev_ms = advance_prefix(
            rows, steps, within_td, wm_ts, skip, n_matches, ts_col,
            ttl_ms=ttl_ms, prev_ms=prev_ms,
        )
        rest = pdf.iloc[i:]
        if (
            not len(rest)
            and ttl_ms is not None
            and prev_ms is not None
            and wm > prev_ms + 2 * ttl_ms
        ):
            state.remove()  # idle past TTL, nothing buffered
        else:
            state.update(
                (
                    n_matches,
                    prev_ms,
                    base64.b64encode(pickle.dumps(rest)).decode("ascii"),
                )
            )
            if len(rest):
                state.setTimeoutTimestamp(wm + 1)
            elif ttl_ms is not None and prev_ms is not None:
                state.setTimeoutTimestamp(prev_ms + 2 * ttl_ms)
        if out:
            yield pd.DataFrame(out)[["match_id", "var", "seq_no", *cols]]

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )
