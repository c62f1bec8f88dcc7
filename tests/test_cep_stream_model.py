"""Property test for the streaming-CEP finality rule (no Spark): feeding
rows to ``advance_prefix`` chunk-by-chunk with any valid watermark
progression must emit exactly the batch matches whose start window is
closed by the final watermark — same matches, same order, same ids."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_spark.operators.cep import (
    SKIP_PAST_LAST_ROW,
    Pattern,
    _match_from,
    _span_to_timedelta,
)
from flink_spark.streaming.cep_stream import advance_prefix

WITHIN = "10 seconds"
DELAY_MS = 2000

PATTERNS = [
    Pattern.begin("A", lambda r: r["t"] == "a")
    .next("B", lambda r: r["t"] == "b")
    .within(WITHIN),
    Pattern.begin("A", lambda r: r["t"] == "a")
    .followed_by("B", lambda r: r["t"] == "b")
    .within(WITHIN),
    Pattern.begin("E", lambda r: r["t"] == "a")
    .one_or_more()
    .within(WITHIN),
    # trailing notFollowedBy (timeout pattern): absence must be decided
    # identically for any chunk placement — a 'b' arriving in a later
    # chunk but inside the window kills the pending match, never emits
    Pattern.begin("A", lambda r: r["t"] == "a")
    .not_followed_by("NB", lambda r: r["t"] == "b")
    .within(WITHIN),
    # in-between notFollowedBy: no 'x' allowed in the a→b gap
    Pattern.begin("A", lambda r: r["t"] == "a")
    .not_followed_by("NX", lambda r: r["t"] == "x")
    .followed_by("B", lambda r: r["t"] == "b")
    .within(WITHIN),
]


def _batch_with_cutoff(rows, pat, final_wm_ts):
    within_td = _span_to_timedelta(pat.within_span)
    out, i, mid = [], 0, 0
    n = len(rows)
    while i < n:
        m = _match_from(rows, pat.steps, i, within_td, "ts")
        if m is None:
            i += 1
            continue
        mid += 1
        start_ts = rows[m[0][0]]["ts"]
        out.append((mid, tuple(rows[ri]["eid"] for ri, _ in m), start_ts))
        i = max(ri for ri, _ in m) + 1
    return [
        (mid, eids) for mid, eids, s in out if s + within_td <= final_wm_ts
    ]


@settings(max_examples=200, deadline=None)
@given(
    types=st.lists(st.sampled_from("abx"), min_size=1, max_size=18),
    gaps=st.lists(st.integers(0, 8000), min_size=1, max_size=18),
    cuts=st.sets(st.integers(1, 17)),
    pat_i=st.integers(0, len(PATTERNS) - 1),
)
def test_incremental_equals_batch_with_cutoff(types, gaps, cuts, pat_i):
    pat = PATTERNS[pat_i]
    within_td = _span_to_timedelta(WITHIN)
    n = min(len(types), len(gaps))
    t0 = pd.Timestamp("2024-01-01", tz="UTC")
    ts, cur = [], t0
    for g in gaps[:n]:
        cur = cur + pd.Timedelta(milliseconds=g)
        ts.append(cur)
    rows = [
        {"eid": i, "t": types[i], "ts": ts[i]} for i in range(n)
    ]  # already ts-sorted

    # incremental: chunks split at cut points; watermark before each new
    # chunk cannot exceed (first undelivered ts - 1ms); final wm = max-delay
    bounds = sorted(c for c in cuts if c < n) + [n]
    emitted, buf, mid = [], [], 0
    start = 0
    wm_ts = pd.Timestamp.min.tz_localize("UTC")
    for b in bounds:
        chunk = rows[start:b]
        start = b
        if b < n:
            cand = rows[b]["ts"] - pd.Timedelta(milliseconds=1)
        else:
            cand = rows[-1]["ts"] - pd.Timedelta(milliseconds=DELAY_MS)
        wm_ts = max(wm_ts, cand)  # watermarks are monotonic
        buf = sorted(buf + chunk, key=lambda r: (r["ts"].value, r["eid"]))
        out, i, mid, _prev = advance_prefix(
            buf, pat.steps, within_td, wm_ts, SKIP_PAST_LAST_ROW, mid, "ts"
        )
        emitted.extend(out)
        buf = buf[i:]

    expected = _batch_with_cutoff(rows, pat, wm_ts)

    got = {}
    for r in emitted:
        got.setdefault(r["match_id"], []).append(r["eid"])
    got_list = [(mid_, tuple(eids)) for mid_, eids in sorted(got.items())]
    assert got_list == expected
