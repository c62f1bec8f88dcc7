"""EXPLAIN PLAN_ADVICE analog (reference ExplainDetail#PLAN_ADVICE and the
plan-advice processors under flink-table-planner/.../plan/nodes/exec/
processor/): static audit of a Spark physical plan that emits structured
advice rows when the plan deviates from the shapes we'd want at 100 TB —
the same checks PLANS.md applies by hand (filter pushdown, map-side
partial aggregation, join strategy, Python-crossing cost).

The rule engine parses ``executedPlan().toString()`` into an indented node
tree (no py4j traversal — one JVM string crossing) and runs structural
rules. A clean plan yields ZERO advice rows; that property is itself
gated by the ``explain_plan_advice_clean`` query.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Advice:
    rule: str
    severity: str  # 'warn' | 'info'
    node: str      # the offending plan node (truncated)
    hint: str


@dataclass
class _Node:
    depth: int
    text: str
    children: list


_TREE_PREFIX = re.compile(r"^(?P<indent>[:\s]*)(?:\+-\s|:-\s)?(?P<body>.*)$")


def _parse_tree(plan: str) -> list[_Node]:
    """Parse a SparkPlan toString into nodes with depth + children.

    Depth derives from the marker column: each tree level adds three
    columns of ``:  `` / ``+- `` scaffolding."""
    nodes: list[_Node] = []
    stack: list[_Node] = []
    for raw in plan.splitlines():
        if not raw.strip():
            break  # blank line ends the tree section
        m = _TREE_PREFIX.match(raw)
        body = m.group("body").strip()
        if not body:
            continue
        marker = raw.find("+-")
        if marker < 0:
            marker = raw.find(":-")
        depth = 0 if marker < 0 else marker // 3 + 1
        body = re.sub(r"^\*\(\d+\)\s*", "", body)  # strip codegen star
        node = _Node(depth, body, [])
        while stack and stack[-1].depth >= depth:
            stack.pop()
        if stack:
            stack[-1].children.append(node)
        nodes.append(node)
        stack.append(node)
    return nodes


def _name(node: _Node) -> str:
    return node.text.split("(", 1)[0].split(" ", 1)[0]


def _first_significant(node: _Node):
    """Descend through pass-through wrappers to the first node that
    changes data shape (agg/join/scan/...)."""
    cur = node
    while cur is not None:
        nm = _name(cur)
        if nm in ("ColumnarToRow", "InputAdapter", "Sort", "Project",
                  "WholeStageCodegen", "Coalesce"):
            cur = cur.children[0] if cur.children else None
            continue
        return cur
    return None


# a comparison against a literal (number or quoted string) anywhere in the
# filter condition — the pushable-shaped predicate class
_CMP_LIT = re.compile(r"(=|>=|<=|<|>)\s*-?(\d|')")
_PUSHED = re.compile(r"PushedFilters: \[([^\]]*)\]")
# filter classes that actually prune data at the reader (IsNotNull alone
# prunes nothing a comparison was meant to)
_PUSHED_CMP = re.compile(
    r"(GreaterThan|LessThan|EqualTo|GreaterThanOrEqual|LessThanOrEqual|"
    r"In\(|StringStartsWith|StringContains|StringEndsWith)"
)


_STATEFUL_NODES = {
    "HashAggregate", "SortAggregate", "ObjectHashAggregate",
    "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "Window",
    "WindowGroupLimit", "FlatMapGroupsWithState",
}
_ND_CALL = re.compile(r"\b(rand|randn|uuid|shuffle)\(")


def _ndu_advice(nodes) -> list:
    """NDU advice (reference NonDeterministicUpdateAnalyzer — the
    PLAN_ADVICE face of StreamNonDeterministicUpdatePlanVisitor): a
    non-deterministic call computed BELOW a stateful operator means a
    retraction/replay recomputes a different value than the row it must
    cancel. Walk the tree carrying an under-stateful flag downward."""
    out = []

    def walk(node, under_stateful):
        nm = _name(node)
        m = _ND_CALL.search(node.text)
        if m and under_stateful:
            out.append(Advice(
                "non-deterministic-update", "warn", node.text[:160],
                f"non-deterministic function '{m.group(1)}()' feeds a "
                "stateful operator — under update/retract processing (or "
                "task retry) the recomputed value differs from the "
                "original; materialize it first or use a deterministic "
                "expression",
            ))
        nxt = under_stateful or nm in _STATEFUL_NODES
        for c in node.children:
            walk(c, nxt)

    for root in [n for n in nodes if n.depth == 0]:
        walk(root, False)
    return out


def plan_advice(df: DataFrame) -> list[Advice]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    nodes = _parse_tree(plan)
    out: list[Advice] = list(_ndu_advice(nodes))
    for n in nodes:
        nm = _name(n)
        if nm == "CartesianProduct":
            out.append(Advice(
                "cartesian-product", "warn", n.text[:160],
                "cross join over unbounded sides — add equi-join keys or "
                "broadcast the small side",
            ))
        if nm == "BatchEvalPython":
            out.append(Advice(
                "row-python-udf", "warn", n.text[:160],
                "row-at-a-time Python UDF in the plan — use a pandas_udf "
                "(Arrow-batched) or a built-in expression",
            ))
        if nm in ("HashAggregate", "SortAggregate", "ObjectHashAggregate"):
            if "partial_" in n.text:
                continue
            child = n.children[0] if n.children else None
            if child is not None and _name(child) == "Exchange":
                below = _first_significant(
                    child.children[0] if child.children else None
                ) if child.children else None
                # a keys-only dedup aggregate prints functions=[] in BOTH
                # phases (no partial_ marker) — the below-exchange twin is
                # still the map-side combine
                if below is None or (
                    _name(below) not in (
                        "HashAggregate", "SortAggregate", "ObjectHashAggregate"
                    )
                    or (
                        "partial_" not in below.text
                        and "functions=[]" not in below.text
                    )
                ):
                    out.append(Advice(
                        "no-partial-agg", "warn", n.text[:160],
                        "final aggregate shuffles raw rows — enable "
                        "map-side combine (partial aggregation) before "
                        "the exchange",
                    ))
        if nm == "Filter":
            # only a Filter sitting DIRECTLY on a scan (through pass-
            # through wrappers): literal-comparison predicates that did
            # not translate to PushedFilters — typically the column is
            # wrapped in an expression the source API can't push
            scan = _first_significant(n.children[0]) if n.children else None
            pm = _PUSHED.search(scan.text) if scan is not None else None
            if scan is not None and _name(scan).startswith("FileScan") \
                    and "parquet" in scan.text.split("[", 1)[0] \
                    and _CMP_LIT.search(n.text) \
                    and pm is not None and not _PUSHED_CMP.search(pm.group(1)):
                out.append(Advice(
                    "filter-not-pushed", "warn", n.text[:160],
                    "comparison filter above a parquet scan with empty "
                    "PushedFilters — push the predicate to the reader "
                    "(avoid wrapping the column in an expression)",
                ))
    return out


def advice_df(df: DataFrame):
    """Advice rows as a DataFrame (the EXPLAIN PLAN_ADVICE result set);
    empty means the plan is the one we'd want."""
    rows = [(a.rule, a.severity, a.node, a.hint) for a in plan_advice(df)]
    return df.sparkSession.createDataFrame(
        rows, "rule string, severity string, node string, hint string"
    )


def json_execution_plan(df: DataFrame) -> str:
    """EXPLAIN JSON_EXECUTION_PLAN (reference ExplainDetail.java:39 — the
    StreamGraph JSON Flink renders via getStreamGraphJson): serialize the
    Spark physical plan into the Flink-shaped node graph. Each node gets
    id / type / pact / contents / parallelism / predecessors, where the
    ship_strategy is derived from the Exchange kind between the nodes
    (hashpartitioning → HASH, SinglePartition → GLOBAL, broadcast →
    BROADCAST, rangepartitioning → RANGE, none → FORWARD)."""
    import json

    spark = df.sparkSession
    plan = df._jdf.queryExecution().executedPlan().toString()
    nodes = _parse_tree(plan)
    parallelism = spark.sparkContext.defaultParallelism

    out_nodes = []
    ids: dict[int, int] = {}

    def ship_strategy(exchange_text: str | None) -> str:
        if exchange_text is None:
            return "FORWARD"
        t = exchange_text
        if "BroadcastExchange" in t or "broadcast" in t:
            return "BROADCAST"
        if "SinglePartition" in t:
            return "GLOBAL"
        if "rangepartitioning" in t:
            return "RANGE"
        if "hashpartitioning" in t:
            return "HASH"
        return "REBALANCE"

    def visit(node: _Node) -> int:
        """Post-order id assignment (sources first, like the reference's
        JSON); Exchange/adapter nodes collapse into the edge annotation."""
        nm = _name(node)
        if nm in ("Exchange", "BroadcastExchange", "AQEShuffleRead",
                  "ShuffleQueryStage", "BroadcastQueryStage", "InputAdapter",
                  "WholeStageCodegen", "ColumnarToRow", "AdaptiveSparkPlan",
                  "ResultQueryStage"):
            # transparent for node identity; remembered via closure below
            pass
        preds = []
        for c in node.children:
            cn, ex_text = c, None
            while True:
                cnm = _name(cn)
                if cnm in ("Exchange", "BroadcastExchange", "AQEShuffleRead",
                           "ShuffleQueryStage", "BroadcastQueryStage",
                           "InputAdapter", "WholeStageCodegen",
                           "ColumnarToRow", "AdaptiveSparkPlan",
                           "ResultQueryStage"):
                    if cnm in ("Exchange", "BroadcastExchange"):
                        ex_text = cn.text
                    if not cn.children:
                        cn = None
                        break
                    cn = cn.children[0]
                    continue
                break
            if cn is None:
                continue
            cid = visit(cn)
            preds.append({"id": cid, "ship_strategy": ship_strategy(ex_text),
                          "side": "second"})
        nid = len(out_nodes) + 1
        is_source = not node.children or nm.endswith("Scan") or nm == "Scan"
        entry = {
            "id": nid,
            "type": ("Source: " + nm) if is_source and not preds else nm,
            "pact": "Data Source" if is_source and not preds else "Operator",
            "contents": node.text[:200],
            "parallelism": parallelism,
        }
        if preds:
            entry["predecessors"] = preds
        out_nodes.append(entry)
        return nid

    roots = [n for n in nodes if n.depth == 0]
    if roots:
        # skip transparent roots down to the first real operator
        root = roots[0]
        while _name(root) in ("AdaptiveSparkPlan", "WholeStageCodegen",
                              "ResultQueryStage", "ColumnarToRow") and root.children:
            root = root.children[0]
        visit(root)
    return json.dumps({"nodes": out_nodes})
