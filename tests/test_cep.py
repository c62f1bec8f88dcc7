"""CEP matcher semantics on scripted sequences (modeled on the reference's
flink-cep PatternITCase style): quantifiers, greedy vs reluctant, strict vs
relaxed contiguity, within-span, and after-match skip strategies."""

from __future__ import annotations

import datetime as dt

import pytest

from flink_spark.operators.cep import (
    SKIP_TO_NEXT_ROW,
    Pattern,
    match_pattern,
)


def _events(spark, seq, gap_minutes=1):
    """seq: list of event_type strings → one keyed, minute-spaced stream."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, i, t0 + dt.timedelta(minutes=i * gap_minutes), s)
        for i, s in enumerate(seq)
    ]
    return spark.createDataFrame(rows, "k INT, event_id INT, ts TIMESTAMP, t STRING")


def _matches(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.match_id, []).append((r.var, r.event_id))
    return [sorted(v, key=lambda x: x[1]) for _, v in sorted(out.items())]


def test_strict_vs_relaxed(spark):
    ev = _events(spark, ["a", "x", "b"])
    strict = Pattern.begin("A", lambda r: r["t"] == "a").next(
        "B", lambda r: r["t"] == "b"
    )
    relaxed = Pattern.begin("A", lambda r: r["t"] == "a").followed_by(
        "B", lambda r: r["t"] == "b"
    )
    assert _matches(match_pattern(ev, strict, ["k"])) == []
    assert _matches(match_pattern(ev, relaxed, ["k"])) == [
        [("A", 0), ("B", 2)]
    ]


def test_one_or_more_greedy_absorbs_run(spark):
    ev = _events(spark, ["a", "b", "b", "b", "c"])
    pat = (
        Pattern.begin("A", lambda r: r["t"] == "a")
        .next("B", lambda r: r["t"] == "b")
        .one_or_more()
        .next("C", lambda r: r["t"] == "c")
    )
    assert _matches(match_pattern(ev, pat, ["k"])) == [
        [("A", 0), ("B", 1), ("B", 2), ("B", 3), ("C", 4)]
    ]


def test_reluctant_takes_minimum(spark):
    # a b b : reluctant B+ stops at the first b that lets the rest match
    ev = _events(spark, ["a", "b", "b"])
    pat = (
        Pattern.begin("A", lambda r: r["t"] == "a")
        .next("B", lambda r: r["t"] == "b")
        .one_or_more(greedy=False)
    )
    assert _matches(match_pattern(ev, pat, ["k"])) == [
        [("A", 0), ("B", 1)]
    ]


def test_zero_or_more_empty_match(spark):
    ev = _events(spark, ["a", "c"])
    pat = (
        Pattern.begin("A", lambda r: r["t"] == "a")
        .next("B", lambda r: r["t"] == "b")
        .zero_or_more()
        .next("C", lambda r: r["t"] == "c")
    )
    assert _matches(match_pattern(ev, pat, ["k"])) == [
        [("A", 0), ("C", 1)]
    ]


def test_optional_present_and_absent(spark):
    pat = lambda: (
        Pattern.begin("A", lambda r: r["t"] == "a")
        .next("B", lambda r: r["t"] == "b")
        .optional()
        .next("C", lambda r: r["t"] == "c")
    )
    assert _matches(match_pattern(_events(spark, ["a", "b", "c"]), pat(), ["k"])) == [
        [("A", 0), ("B", 1), ("C", 2)]
    ]
    assert _matches(match_pattern(_events(spark, ["a", "c"]), pat(), ["k"])) == [
        [("A", 0), ("C", 1)]
    ]


def test_within_span_excludes_slow_matches(spark):
    # events 10 minutes apart; pattern must complete within 15 minutes
    ev = _events(spark, ["a", "b"], gap_minutes=10)
    ok = (
        Pattern.begin("A", lambda r: r["t"] == "a")
        .next("B", lambda r: r["t"] == "b")
        .within("15 minutes")
    )
    too_tight = (
        Pattern.begin("A", lambda r: r["t"] == "a")
        .next("B", lambda r: r["t"] == "b")
        .within("5 minutes")
    )
    assert len(_matches(match_pattern(ev, ok, ["k"]))) == 1
    assert _matches(match_pattern(ev, too_tight, ["k"])) == []


def test_skip_past_last_row_vs_to_next_row(spark):
    # overlapping aa-pairs: a a a  → PAST_LAST_ROW: one match; TO_NEXT_ROW: two
    ev = _events(spark, ["a", "a", "a"])
    pat = lambda: Pattern.begin("A", lambda r: r["t"] == "a").next(
        "B", lambda r: r["t"] == "a"
    )
    past = _matches(match_pattern(ev, pat(), ["k"]))
    nxt = _matches(match_pattern(ev, pat(), ["k"], skip=SKIP_TO_NEXT_ROW))
    assert past == [[("A", 0), ("B", 1)]]
    assert nxt == [[("A", 0), ("B", 1)], [("A", 1), ("B", 2)]]


def test_matches_are_per_key(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 0, t0, "a"), (2, 1, t0 + dt.timedelta(minutes=1), "b"),
        (1, 2, t0 + dt.timedelta(minutes=2), "b"),
    ]
    ev = spark.createDataFrame(rows, "k INT, event_id INT, ts TIMESTAMP, t STRING")
    pat = Pattern.begin("A", lambda r: r["t"] == "a").next(
        "B", lambda r: r["t"] == "b"
    )
    out = match_pattern(ev, pat, ["k"]).collect()
    # key 2 has no 'a'; key 1's a(0) is followed (within key 1) by b(2)
    assert {(r.k, r.var, r.event_id) for r in out} == {
        (1, "A", 0), (1, "B", 2)
    }


def test_times_exact_and_range(spark):
    ev = _events(spark, ["a", "b", "b", "b", "c"])
    # B{2} exactly two (greedy run capped at 2): anchors at first b-run
    pat2 = (
        Pattern.begin("A", lambda r: r["t"] == "a")
        .next("B", lambda r: r["t"] == "b").times(2)
        .next("C", lambda r: r["t"] == "c")
    )
    # a b b b c: A@0, B must be exactly rows 1-2, then C must be row 3 ('b') → no match
    assert _matches(match_pattern(ev, pat2, ["k"])) == []
    pat23 = (
        Pattern.begin("A", lambda r: r["t"] == "a")
        .next("B", lambda r: r["t"] == "b").times(2, 3)
        .next("C", lambda r: r["t"] == "c")
    )
    assert _matches(match_pattern(ev, pat23, ["k"])) == [
        [("A", 0), ("B", 1), ("B", 2), ("B", 3), ("C", 4)]
    ]


def test_times_open_ended(spark):
    ev = _events(spark, ["b", "b", "b", "c"])
    pat = (
        Pattern.begin("B", lambda r: r["t"] == "b").times(2, None)
        .next("C", lambda r: r["t"] == "c")
    )
    assert _matches(match_pattern(ev, pat, ["k"])) == [
        [("B", 0), ("B", 1), ("B", 2), ("C", 3)]
    ]


def test_alternation_branch_naming(spark):
    ev = _events(spark, ["a", "x", "b", "c"])
    pat = (
        Pattern.begin_any(
            [("A", lambda r: r["t"] == "a"), ("B", lambda r: r["t"] == "b")]
        )
        .one_or_more()
        .next("C", lambda r: r["t"] == "c")
    )
    # run of (a|b) must be consecutive and end right before c: only 'b'@2
    assert _matches(match_pattern(ev, pat, ["k"])) == [
        [("B", 2), ("C", 3)]
    ]


def test_alternation_mixed_run(spark):
    ev = _events(spark, ["a", "b", "a", "c"])
    pat = (
        Pattern.begin_any(
            [("A", lambda r: r["t"] == "a"), ("B", lambda r: r["t"] == "b")]
        )
        .one_or_more()
        .next("C", lambda r: r["t"] == "c")
    )
    assert _matches(match_pattern(ev, pat, ["k"])) == [
        [("A", 0), ("B", 1), ("A", 2), ("C", 3)]
    ]


def test_leading_quantifier_anchors_at_run_start(spark):
    # regression: a quantified FIRST step must absorb the whole run from
    # its anchor, not just the final element
    ev = _events(spark, ["b", "b", "c"])
    pat = (
        Pattern.begin("B", lambda r: r["t"] == "b").one_or_more()
        .next("C", lambda r: r["t"] == "c")
    )
    assert _matches(match_pattern(ev, pat, ["k"])) == [
        [("B", 0), ("B", 1), ("C", 2)]
    ]


class TestAfterMatchSkipToVar:
    """AFTER MATCH SKIP TO FIRST/LAST <var> (reference
    AfterMatchSkipStrategy.skipToFirst/skipToLast): scanning resumes AT
    the chosen element, producing overlapping matches; a strategy that
    would not advance past the match start raises, as the reference
    does."""

    def _df(self, spark):
        rows = [
            # a b b c  → A B+ C with SKIP TO LAST B resumes at the last b
            (1, "a", "2024-01-01 00:00:00"),
            (2, "b", "2024-01-01 00:01:00"),
            (3, "b", "2024-01-01 00:02:00"),
            (4, "c", "2024-01-01 00:03:00"),
            (5, "a", "2024-01-01 00:04:00"),
        ]
        from pyspark.sql import functions as F

        df = spark.createDataFrame(rows, "event_id int, etype string, ts string")
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz")).withColumn(
            "k", F.lit("x")
        )

    def test_skip_to_last_resumes_at_var(self, spark):
        from flink_spark.operators.cep import SKIP_TO_LAST, match_pattern

        pat = (
            Pattern.begin("A", lambda r: r["etype"] == "a")
            .followed_by("B", lambda r: r["etype"] == "b")
            .one_or_more()
            .followed_by("C", lambda r: r["etype"] == "c")
        )
        got = match_pattern(
            self._df(spark), pat, ["k"], ts_col="ts",
            skip=(SKIP_TO_LAST, "B"),
        ).collect()
        by_match = {}
        for r in got:
            by_match.setdefault(r.match_id, []).append((r.var, r.event_id))
        # match 1 consumes a b b c; resume AT the last B (row 3): no 'a'
        # there, so no second match — but resume point is 3, not 5
        assert by_match[1] == [("A", 1), ("B", 2), ("B", 3), ("C", 4)]
        assert len(by_match) == 1

    def test_skip_to_first_non_advancing_raises(self, spark):
        from flink_spark.operators.cep import SKIP_TO_FIRST, match_pattern

        pat = (
            Pattern.begin("A", lambda r: r["etype"] == "a")
            .followed_by("B", lambda r: r["etype"] == "b")
        )
        with pytest.raises(Exception, match="does not advance"):
            match_pattern(
                self._df(spark), pat, ["k"], ts_col="ts",
                skip=(SKIP_TO_FIRST, "A"),
            ).collect()


# -- negation (reference Pattern.java:306-359 notNext/notFollowedBy, ------
# -- NFACompiler NOT-state compilation) -----------------------------------


def test_not_next_blocks_adjacent(spark):
    """a notNext(b) c: 'a x c' matches via relaxed c; 'a b c' must not."""
    mk = lambda seq: _events(spark, seq)
    pat = lambda: (
        Pattern.begin("A", lambda r: r["t"] == "a")
        .not_next("NB", lambda r: r["t"] == "b")
        .followed_by("C", lambda r: r["t"] == "c")
    )
    assert _matches(match_pattern(mk(["a", "x", "c"]), pat(), ["k"])) == [
        [("A", 0), ("C", 2)]
    ]
    assert _matches(match_pattern(mk(["a", "b", "c"]), pat(), ["k"])) == []


def test_not_followed_by_in_between(spark):
    """a notFollowedBy(b) c: no b anywhere in the gap, adjacent or not."""
    mk = lambda seq: _events(spark, seq)
    pat = lambda: (
        Pattern.begin("A", lambda r: r["t"] == "a")
        .not_followed_by("NB", lambda r: r["t"] == "b")
        .followed_by("C", lambda r: r["t"] == "c")
    )
    assert _matches(match_pattern(mk(["a", "x", "x", "c"]), pat(), ["k"])) == [
        [("A", 0), ("C", 3)]
    ]
    # b deep in the gap kills the match even though c still follows
    assert _matches(match_pattern(mk(["a", "x", "b", "c"]), pat(), ["k"])) == []


def test_not_followed_by_trailing_is_timeout_pattern(spark):
    """a notFollowedBy(b) WITHIN w: match iff no b inside the window after
    a (the fraud/timeout shape the reference compiles to a timed NOT-state)."""
    mk = lambda seq: _events(spark, seq)  # minute-spaced
    pat = lambda: (
        Pattern.begin("A", lambda r: r["t"] == "a")
        .not_followed_by("NB", lambda r: r["t"] == "b")
        .within("2 minutes")
    )
    # b at +3min is outside the window → the match holds
    assert _matches(match_pattern(mk(["a", "x", "x", "b"]), pat(), ["k"])) == [
        [("A", 0)]
    ]
    # b at +1min is inside → no match
    assert _matches(match_pattern(mk(["a", "b", "x", "x"]), pat(), ["k"])) == []


def test_trailing_not_followed_by_requires_within(spark):
    ev = _events(spark, ["a", "b"])
    pat = (
        Pattern.begin("A", lambda r: r["t"] == "a")
        .not_followed_by("NB", lambda r: r["t"] == "b")
    )
    with pytest.raises(ValueError, match="within"):
        match_pattern(ev, pat, ["k"]).collect()


def test_not_followed_by_survives_untaken_optional(spark):
    """a notFollowedBy(b) c? d: when c is absent the forbidden-b constraint
    must carry through the untaken optional into d's gap."""
    mk = lambda seq: _events(spark, seq)
    pat = lambda: (
        Pattern.begin("A", lambda r: r["t"] == "a")
        .not_followed_by("NB", lambda r: r["t"] == "b")
        .followed_by("C", lambda r: r["t"] == "c")
        .optional()
        .followed_by("D", lambda r: r["t"] == "d")
    )
    assert _matches(match_pattern(mk(["a", "x", "d"]), pat(), ["k"])) == [
        [("A", 0), ("D", 2)]
    ]
    assert _matches(match_pattern(mk(["a", "b", "d"]), pat(), ["k"])) == []
    # with c present the constraint stops at c: a later b is irrelevant
    assert _matches(match_pattern(mk(["a", "c", "b", "d"]), pat(), ["k"])) == [
        [("A", 0), ("C", 1), ("D", 3)]
    ]
