"""Changelog-mode inference (reference
FlinkChangelogModeInferenceProgram.scala) — the trait rules, the
validation errors, and the EXPLAIN CHANGELOG_MODE / JSON_EXECUTION_PLAN
SQL surfaces."""

from __future__ import annotations

import json

import pytest

from flink_spark.changelog_mode import (
    ChangelogModeError,
    Node,
    explain,
    modes_table,
)


def _sink(child, mode="retract", pk=()):
    return Node("sink", "Sink", [child], attrs={"mode": mode, "pk": list(pk)})


def _src(mode="insert", pk=None):
    return Node("source", "TableSourceScan",
                attrs={"mode": mode, "pk": pk})


def test_upsert_sink_prefers_only_after_when_pk_satisfied():
    agg = Node("group_agg", "GroupAggregate", [_src()], attrs={"keys": ["k"]})
    rows = modes_table(_sink(agg, mode="upsert", pk=["k"]))
    assert rows == [("Sink", "NONE"), ("GroupAggregate", "I,UA"),
                    ("TableSourceScan", "I")]


def test_upsert_sink_falls_back_when_pk_not_satisfied():
    # sink PK != agg key → cannot upsert by key → BEFORE_AND_AFTER
    agg = Node("group_agg", "GroupAggregate", [_src()], attrs={"keys": ["k"]})
    rows = modes_table(_sink(agg, mode="upsert", pk=["other"]))
    assert rows[1] == ("GroupAggregate", "I,UB,UA")


def test_interval_join_rejects_updating_input():
    agg = Node("group_agg", "GroupAggregate", [_src()], attrs={"keys": ["k"]})
    ij = Node("interval_join", "IntervalJoin", [agg])
    with pytest.raises(ChangelogModeError,
                       match="IntervalJoin doesn't support consuming "
                             "update changes"):
        modes_table(_sink(ij))


def test_append_sink_rejects_updating_input():
    agg = Node("group_agg", "GroupAggregate", [_src()], attrs={"keys": ["k"]})
    with pytest.raises(ChangelogModeError, match="doesn't support consuming"):
        modes_table(_sink(agg, mode="append"))


def test_agg_over_updating_input_gains_delete():
    inner = Node("group_agg", "GroupAggregate", [_src()], attrs={"keys": ["a"]})
    outer = Node("group_agg", "GroupAggregate2", [inner], attrs={"keys": ["b"]})
    rows = modes_table(_sink(outer))
    # outer agg consumes updates → groups can empty out → D appears
    assert rows[1] == ("GroupAggregate2", "I,UB,UA,D")


def test_dedup_keep_last_is_updating():
    dd = Node("dedup", "Deduplicate", [_src()],
              attrs={"keep": "last", "keys": ["k"]})
    rows = modes_table(_sink(dd))
    assert rows[1][1] == "I,UB,UA,D"


def test_upsert_source_cannot_feed_retract_without_normalize():
    # upsert source provides ONLY_UPDATE_AFTER; a retract consumer needs
    # UPDATE_BEFORE → unsatisfiable without ChangelogNormalize
    with pytest.raises(ChangelogModeError):
        modes_table(_sink(_src(mode="upsert", pk=["k"])))


def test_cdc_source_full_changelog_passthrough():
    rows = modes_table(_sink(Node("calc", "Calc", [_src(mode="cdc",
                                                        pk=["k"])])))
    assert rows == [("Sink", "NONE"), ("Calc", "I,UB,UA,D"),
                    ("TableSourceScan", "I,UB,UA,D")]


def test_union_of_insert_only_stays_insert_only():
    u = Node("union", "Union", [_src(), _src()])
    rows = modes_table(_sink(u, mode="append"))
    assert rows[1] == ("Union", "I")


def test_join_inner_forwards_union_of_sides_outer_is_all():
    agg = Node("group_agg", "GroupAggregate", [_src()], attrs={"keys": ["k"]})
    inner = Node("join", "Join", [agg, _src()], attrs={"how": "inner"})
    rows = modes_table(_sink(inner))
    assert rows[1] == ("Join", "I,UB,UA")
    outer = Node("join", "JoinL", [_src(), _src()], attrs={"how": "left"})
    rows = modes_table(_sink(outer))
    assert rows[1] == ("JoinL", "I,UB,UA,D")


def test_explain_renders_tree_scaffolding():
    agg = Node("group_agg", "GroupAggregate", [_src()], attrs={"keys": ["k"]})
    txt = explain(_sink(agg, mode="upsert", pk=["k"]))
    assert txt.splitlines() == [
        "Sink(changelogMode=[NONE])",
        "+- GroupAggregate(changelogMode=[I,UA])",
        "   +- TableSourceScan(changelogMode=[I])",
    ]


def test_explain_changelog_mode_sql_surface(spark, sf_dir):
    from flink_spark.catalog import TableEnvironment
    from flink_spark.sources.tables import load_table

    env = TableEnvironment(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("cmt_orders")
    txt = env.execute_sql(
        "EXPLAIN CHANGELOG_MODE SELECT o_orderstatus, count(*) AS n "
        "FROM cmt_orders GROUP BY o_orderstatus"
    ).collect()[0][0]
    assert "GroupAggregate(changelogMode=[I,UB,UA])" in txt
    assert "changelogMode=[I]" in txt


def test_json_execution_plan_sql_surface(spark, sf_dir):
    from flink_spark.catalog import TableEnvironment
    from flink_spark.sources.tables import load_table

    env = TableEnvironment(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("jep_orders")
    raw = env.execute_sql(
        "EXPLAIN JSON_EXECUTION_PLAN SELECT o_orderstatus, count(*) AS n "
        "FROM jep_orders GROUP BY o_orderstatus"
    ).collect()[0][0]
    plan = json.loads(raw)
    nodes = plan["nodes"]
    assert nodes, "empty node graph"
    assert nodes[0]["pact"] == "Data Source"
    assert nodes[0]["type"].startswith("Source: ")
    # the final aggregate reads over a HASH exchange
    strategies = {
        p["ship_strategy"] for n in nodes for p in n.get("predecessors", [])
    }
    assert "HASH" in strategies
    ids = [n["id"] for n in nodes]
    assert ids == sorted(ids)
    for n in nodes:
        for p in n.get("predecessors", []):
            assert p["id"] < n["id"], "predecessor must be defined first"


def test_explain_multiple_details(spark, sf_dir):
    """EXPLAIN with several details in one statement (reference
    SqlRichExplain `EXPLAIN [ExplainDetail[, ExplainDetail]*] <stmt>`):
    a combined text with one section per detail."""
    from flink_spark.catalog import TableEnvironment
    from flink_spark.sources.tables import load_table

    env = TableEnvironment(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("med_orders")
    txt = env.execute_sql(
        "EXPLAIN ESTIMATED_COST, CHANGELOG_MODE, PLAN_ADVICE, "
        "JSON_EXECUTION_PLAN SELECT o_orderstatus, count(*) AS n "
        "FROM med_orders GROUP BY o_orderstatus"
    ).collect()[0][0]
    assert "== Optimized Physical Plan With Estimated Cost ==" in txt
    assert "sizeInBytes" in txt  # real optimizer statistics
    assert "== Changelog Mode ==" in txt
    assert "GroupAggregate(changelogMode=[I,UB,UA])" in txt
    assert "== Optimization Advice ==" in txt
    assert "No available advice." in txt  # clean plan yields zero advice
    assert "== Physical Execution Plan ==" in txt
    assert '"ship_strategy": "HASH"' in txt


class TestNduAnalysis:
    """Non-deterministic update analysis (reference
    StreamNonDeterministicUpdatePlanVisitor): NDU columns and conditions
    are rejected exactly when update/retract correctness needs them."""

    def _pipeline(self, nd_cols=None, nd_condition=None, sink_mode="retract",
                  sink_pk=(), agg_keys=("k",)):
        from flink_spark.changelog_mode import Node

        calc_attrs = {}
        if nd_cols:
            calc_attrs["nd_cols"] = nd_cols
        if nd_condition:
            calc_attrs["nd_condition"] = nd_condition
            calc_attrs["condition"] = "day = DATE_FORMAT(NOW(), 'yyMMdd')"
        return Node("sink", "Sink", [
            Node("calc", "Calc", [
                Node("group_agg", "GroupAggregate", [
                    Node("source", "TableSourceScan",
                         attrs={"mode": "insert"}),
                ], attrs={"keys": list(agg_keys)}),
            ], attrs=calc_attrs),
        ], attrs={"mode": sink_mode, "pk": list(sink_pk)})

    def test_nd_column_in_retract_pipeline_rejected(self):
        import pytest

        from flink_spark.changelog_mode import (
            NonDeterministicUpdateError,
            check_ndu,
        )

        p = self._pipeline(nd_cols={"day": "NOW()"})
        with pytest.raises(NonDeterministicUpdateError,
                           match=r"The column\(s\): day\(generated by "
                                 r"non-deterministic function: NOW\(\) \) "
                                 r"can not satisfy the determinism"):
            check_ndu(p)

    def test_nd_column_tolerated_when_upsert_key_serves_pk(self):
        from flink_spark.changelog_mode import check_ndu

        # upsert sink updated BY KEY: only the pk columns must be
        # deterministic — an nd payload column is acceptable
        p = self._pipeline(nd_cols={"day": "NOW()"}, sink_mode="upsert",
                           sink_pk=("k",))
        check_ndu(p)  # must not raise

    def test_nd_column_on_pk_still_rejected(self):
        import pytest

        from flink_spark.changelog_mode import (
            NonDeterministicUpdateError,
            check_ndu,
        )

        p = self._pipeline(nd_cols={"k": "UUID()"}, sink_mode="upsert",
                           sink_pk=("k",))
        with pytest.raises(NonDeterministicUpdateError):
            check_ndu(p)

    def test_nd_condition_in_update_pipeline_rejected(self):
        import pytest

        from flink_spark.changelog_mode import (
            NonDeterministicUpdateError,
            check_ndu,
        )

        p = self._pipeline(nd_condition="NOW")
        with pytest.raises(NonDeterministicUpdateError,
                           match="There exists non deterministic function: "
                                 "'NOW' in condition"):
            check_ndu(p)

    def test_insert_only_pipeline_ignores_nd(self):
        from flink_spark.changelog_mode import Node, check_ndu

        # append pipeline: NDU analysis does not care (visitSink fast path)
        p = Node("sink", "Sink", [
            Node("calc", "Calc", [
                Node("source", "TableSourceScan", attrs={"mode": "insert"}),
            ], attrs={"nd_cols": {"r": "RAND()"},
                      "nd_condition": "RAND", "condition": "rand() > 0.5"}),
        ], attrs={"mode": "append"})
        check_ndu(p)  # must not raise


class TestDeleteKindTrait:
    """Third trait pass (SatisfyDeleteKindTraitVisitor): key-only
    deletes render PD; normalize re-expands them to full deletes."""

    def test_upsert_source_renders_partial_delete(self):
        from flink_spark.changelog_mode import Node, modes_table

        rows = modes_table(Node("sink", "Sink", [
            Node("normalize", "ChangelogNormalize", [
                Node("source", "TableSourceScan",
                     attrs={"mode": "upsert", "pk": ["k"]}),
            ], attrs={"pk": ["k"]}),
        ], attrs={"mode": "retract"}))
        assert rows[-1] == ("TableSourceScan", "I,UA,PD")
        assert rows[1] == ("ChangelogNormalize", "I,UB,UA,D")

    def test_cdc_source_keeps_full_deletes(self):
        from flink_spark.changelog_mode import Node, modes_table

        rows = modes_table(Node("sink", "Sink", [
            Node("source", "TableSourceScan",
                 attrs={"mode": "cdc", "pk": ["k"]}),
        ], attrs={"mode": "retract"}))
        assert rows[-1] == ("TableSourceScan", "I,UB,UA,D")

    def test_stateful_operators_produce_full_deletes(self):
        from flink_spark.changelog_mode import Node, modes_table

        # agg over normalize: D survives but as a FULL delete, not PD
        rows = modes_table(Node("sink", "Sink", [
            Node("group_agg", "GroupAggregate", [
                Node("normalize", "ChangelogNormalize", [
                    Node("source", "TableSourceScan",
                         attrs={"mode": "upsert", "pk": ["k"]}),
                ], attrs={"pk": ["k"]}),
            ], attrs={"keys": ["g"]}),
        ], attrs={"mode": "retract"}))
        assert rows[1] == ("GroupAggregate", "I,UB,UA,D")
