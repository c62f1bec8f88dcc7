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


# a bare attribute — possibly inside literal ARITHMETIC the user could
# rewrite away ((k + 1) > 100 → k > 99) — compared against a literal:
# the predicate class a parquet reader could push. Function-wrapped
# comparisons (size(split(text)) >= 10) are excluded: nothing there is
# pushable under any rewrite, so flagging them is noise (refined r9 —
# the Gopher-filter false positive)
_CMP_LIT = re.compile(
    r"\(+\w+#\d+L?(?:\s[-+*/]\s-?[\d.]+\)?)*\s(?:=|>=|<=|<|>)\s-?(?:\d|')"
)
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


# rank-function window + literal rank filter — the WindowGroupLimit-
# eligible top-k shape (Spark InsertWindowGroupLimit: row_number/rank/
# dense_rank, ASC/DESC single window, predicate attr <= / < / = literal)
_RANK_FN = re.compile(r"\b(row_number|rank|dense_rank)\(\)")
_RANK_FILTER = re.compile(r"\((\w+#\d+) (?:<=|<|=) (\d+)\)")


def _subtree(node: _Node) -> list:
    out, stack = [], [node]
    while stack:
        cur = stack.pop()
        out.append(cur)
        stack.extend(cur.children)
    return out


def _window_group_limit_advice(nodes) -> list:
    """r8 audit rule (VERDICT r7 'keep the plan-advice gate growing'):
    a per-group top-k — Filter(rank <= k) over a rank-function Window —
    that planned WITHOUT WindowGroupLimit pruning re-sorts and shuffles
    EVERY row of every group before discarding all but k; at 100 TB the
    partial (below-exchange) group-limit is the difference between
    shuffling k rows per group and shuffling the corpus. Two shapes:
      - no WindowGroupLimit at all (optimizer rule disabled / pattern
        obscured, e.g. a non-literal k);
      - a Final group limit whose exchange has no Partial twin below it
        (map-side pruning lost)."""
    out = []
    for n in nodes:
        if _name(n) != "Filter" or not n.children:
            continue
        win = _first_significant(n.children[0])
        if win is None or _name(win) != "Window" \
                or not _RANK_FN.search(win.text):
            continue
        # ANY rank-bound comparison in the (possibly compound) filter may
        # be the top-k predicate — taking only the first match would let
        # 'Filter ((flag = 1) AND (rn <= 3))' slip past the audit
        if not any(
            f"AS {m.group(1)}" in win.text
            for m in _RANK_FILTER.finditer(n.text)
        ):
            continue
        below = _subtree(win)[1:]
        wgl = [d for d in below if _name(d) == "WindowGroupLimit"]
        if not wgl:
            out.append(Advice(
                "topk-no-window-group-limit", "warn", n.text[:160],
                "rank-filter top-k planned without WindowGroupLimit — "
                "every group's full row set is sorted/shuffled before "
                "k survivors are kept; use a literal rank bound so "
                "InsertWindowGroupLimit can prune per-partition",
            ))
            continue
        has_partial = any("Partial" in d.text for d in wgl)
        has_exchange = any(
            _name(d).startswith("Exchange") or _name(d) == "ShuffleQueryStage"
            for d in below
        )
        if has_exchange and not has_partial:
            out.append(Advice(
                "window-group-limit-no-partial", "warn", n.text[:160],
                "top-k shuffles raw groups: WindowGroupLimit(Final) has "
                "no Partial twin below the exchange — map-side pruning "
                "lost, the shuffle carries whole groups instead of k "
                "rows per group",
            ))
    return out


_STATS_SIZE = re.compile(
    r"Statistics\(sizeInBytes=([\d.]+)\s*(B|KiB|MiB|GiB|TiB|PiB|EiB)"
)
_SIZE_MULT = {"B": 1.0, "KiB": 2.0 ** 10, "MiB": 2.0 ** 20,
              "GiB": 2.0 ** 30, "TiB": 2.0 ** 40, "PiB": 2.0 ** 50,
              "EiB": 2.0 ** 60}


def _stats_size(node: _Node) -> float | None:
    m = _STATS_SIZE.search(node.text)
    return float(m.group(1)) * _SIZE_MULT[m.group(2)] if m else None


def _parse_byte_conf(v: str) -> float:
    """Parse a Spark byte-size conf value ('10MB', '10485760b', '-1')."""
    m = re.fullmatch(
        r"(-?\d+(?:\.\d+)?)\s*([kKmMgGtTpP]?)[bB]?", v.strip()
    )
    if not m:
        return -1.0
    mult = {"": 1, "k": 2 ** 10, "m": 2 ** 20, "g": 2 ** 30,
            "t": 2 ** 40, "p": 2 ** 50}[m.group(2).lower()]
    return float(m.group(1)) * mult


def join_strategy_advice(stats_plan: str, physical_plan: str,
                         threshold_bytes: float) -> list[Advice]:
    """r9 audit rule (VERDICT r8 #7, the last unencoded item of the plan
    checklist): a SortMergeJoin/ShuffledHashJoin whose one side's
    ESTIMATED size (the optimized logical plan's Statistics, the same
    numbers EXPLAIN ESTIMATED_COST prints) sits under the broadcast
    threshold shuffles BOTH sides where a broadcast would ship only the
    small one — at 100 TB that is a corpus-wide exchange bought for
    nothing. Fires when more under-threshold joins exist than broadcast
    joins in the physical plan (a forced SHUFFLE hint, a disabled
    threshold, or missing stats at planning time)."""
    phys = _parse_tree(physical_plan)
    if not any(_name(n) in ("SortMergeJoin", "ShuffledHashJoin")
               for n in phys):
        return []
    n_bcast = sum(
        1 for n in phys
        if _name(n) in ("BroadcastHashJoin", "BroadcastNestedLoopJoin")
    )
    small = []
    for n in _parse_tree(stats_plan):
        if _name(n) != "Join" or len(n.children) < 2:
            continue
        sizes = [_stats_size(c) for c in n.children[:2]]
        if None in sizes:
            continue
        lo = min(sizes)
        if lo <= threshold_bytes:
            small.append((lo, n))
    # each physical broadcast join accounts for one small-side logical
    # join; only the excess (smallest first) is mis-planned
    small.sort(key=lambda t: t[0])
    out = []
    for lo, n in small[: max(0, len(small) - n_bcast)]:
        out.append(Advice(
            "join-small-side-not-broadcast", "warn", n.text[:160],
            f"a join side is estimated at {int(lo)} bytes, under the "
            f"{int(threshold_bytes)}-byte broadcast threshold, yet the "
            "plan shuffles both sides (SortMergeJoin/ShuffledHashJoin) "
            "— broadcast the small side (drop the SHUFFLE_* hint, "
            "re-enable spark.sql.autoBroadcastJoinThreshold, or ANALYZE "
            "the table so the planner sees its size)",
        ))
    return out


def advise_plan_text(plan: str) -> list[Advice]:
    """Run the full rule engine over a physical-plan string (the testable
    core: plan_advice(df) is this over executedPlan().toString()).
    Identical findings from an AQE plan's duplicated Final/Initial
    sections collapse to one advice row."""
    nodes = _parse_tree(plan)
    out: list[Advice] = list(_ndu_advice(nodes))
    out.extend(_window_group_limit_advice(nodes))
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
    seen: set = set()
    uniq = []
    for a in out:
        key = (a.rule, a.node)
        if key not in seen:
            seen.add(key)
            uniq.append(a)
    return uniq


def plan_advice(df: DataFrame) -> list[Advice]:
    qe = df._jdf.queryExecution()
    physical = qe.executedPlan().toString()
    out = advise_plan_text(physical)
    thr = _parse_byte_conf(
        df.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10MB"
        )
    )
    if thr <= 0:
        # broadcast disabled by conf: audit against the default anyway —
        # a tiny side shuffled because broadcasting was switched off is
        # exactly what the rule exists to surface
        thr = 10 * 1024 * 1024
    out.extend(join_strategy_advice(qe.stringWithStats(), physical, thr))
    return out


# ---------------------------------------------------------------------------
# driver-side collect audit (r8 rule, VERDICT r7 "flag any driver-side
# .collect() not bounded by a literal limit"): a source-level sweep, since
# boundedness is a property of the call site, not of any single plan. Every
# .collect() in flink_spark/ must be either (a) preceded in the same
# statement by a literal .limit(<int>), or (b) allowlisted below with a
# justification of WHY its result is bounded at 100 TB. A new unbounded
# collect anywhere fails tests/test_plan_advice.py.

#: (relpath, enclosing function) -> (max allowed sites, why bounded)
COLLECT_ALLOWLIST: dict = {
    ("streaming/core.py", "_agg"):
        (1, "scalar: per-batch MAX(ts) aggregate — one row (threaded "
            "thunk overlapped with the channel writes, guide §2.6)"),
    ("streaming/idleness.py", "process"):
        (1, "per-source watermark aggregate — one row per source"),
    ("streaming/idleness.py", "run_round"):
        (2, "per-source watermark aggregates — one row per source"),
    ("streaming/deltajoin.py", "process"):
        (1, "scalar MIN(event ts) aggregate over the current batch — "
            "one row (drives TTL compaction)"),
    ("llm/dedup.py", "_potential"):
        (1, "scalar SUM(potential) convergence probe — one row"),
    ("llm/clustering.py", "kmeans"):
        (2, "init limit(k) rows; update k×d group means — both tiny"),
    ("llm/similarity.py", "pq_train"):
        (1, "training sample byte-capped at rows×dim ≤ "
            "PQ_TRAIN_BUDGET_ELEMS (applies for train_limit=None too)"),
    ("formats/avro.py", "write_avro"):
        (1, "mapInPandas side-effect writer: one count row per partition"),
    ("datastream.py", "execute_and_collect"):
        (1, "public terminal action (Flink executeAndCollect parity) — "
            "boundedness is the caller's contract, as in the reference"),
    ("datastream_v2.py", "to_list"):
        (1, "public terminal action (V2 stream terminal) — boundedness "
            "is the caller's contract, as in the reference"),
    ("datastream_v2.py", "connect_and_process"):
        (1, "broadcast side only: small + bounded by contract (the "
            "reference replicates broadcast state fully to every task "
            "too)"),
    ("table_api.py", "collect"):
        (1, "public terminal action (Table#execute#collect parity)"),
    ("catalog.py", "_affected_partitions"):
        (1, "limit(_DML_PRUNE_MAX_PARTS + 1) — constant-bounded probe"),
    ("catalog.py", "execute_sql"):
        (1, "SHOW TABLES metadata listing — bounded by table count"),
}

_COLLECT_GATED_DIRS = ("queries/",)  # gated-query harness code: audited
# separately — those collects read command results (SHOW/DML counts,
# recall probes over 10×5-row top-k sets) inside test-facing queries.

_LIMIT_LIT = re.compile(r"\.limit\(\s*\d+\s*\)")


def _mask_strings_comments(src: str, lines: list) -> list:
    """Blank every STRING / COMMENT / f-string-part token span (same
    line lengths, spaces in place) so the statement-window walk in
    audit_collect_sites never sees a bracket that lives inside a
    literal — including triple-quoted multi-line strings, which a
    per-line regex cannot mask."""
    import io
    import tokenize

    masked = [list(ln) for ln in lines]
    mask_types = {tokenize.STRING, tokenize.COMMENT}
    for name in ("FSTRING_START", "FSTRING_MIDDLE", "FSTRING_END"):
        t = getattr(tokenize, name, None)
        if t is not None:
            mask_types.add(t)
    try:
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type not in mask_types:
                continue
            (sr, sc), (er, ec) = tok.start, tok.end
            for r in range(sr, er + 1):
                if r - 1 >= len(masked):
                    break
                row = masked[r - 1]
                a = sc if r == sr else 0
                b = ec if r == er else len(row)
                for c in range(a, min(b, len(row))):
                    row[c] = " "
    except (tokenize.TokenError, IndentationError, SyntaxError):
        # unreachable for sources that already ast.parse'd; keep the
        # audit usable on a pathological file rather than crashing
        str_re = re.compile(r"('([^'\\]|\\.)*'|\"([^\"\\]|\\.)*\")")
        return [
            str_re.sub(lambda m: " " * len(m.group(0)), ln).split("#", 1)[0]
            for ln in lines
        ]
    return ["".join(cs) for cs in masked]


def audit_collect_sites(root: str | None = None) -> list:
    """Return [(relpath, func, line, snippet), ...] for every .collect()
    call site that is neither literal-limit-bounded in-statement nor
    allowlisted. Empty list == the audit passes."""
    import ast
    import os

    if root is None:
        root = os.path.dirname(os.path.abspath(__file__))
    flagged = []
    counts: dict = {}
    for dirpath, _dirs, files in os.walk(root):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, root).replace(os.sep, "/")
            if rel == "plan_advice.py":  # this scanner's own strings
                continue
            if any(rel.startswith(d) for d in _COLLECT_GATED_DIRS):
                continue
            with open(path, encoding="utf-8") as f:
                src = f.read()
            if ".collect()" not in src:
                continue
            tree = ast.parse(src)
            spans = []  # (start, end, name) innermost-last
            for node in ast.walk(tree):
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    spans.append(
                        (node.lineno, node.end_lineno or node.lineno,
                         node.name)
                    )
            lines = src.splitlines()
            # bracket/continuation decisions run on COMMENT- and
            # STRING-masked lines: a '(' inside a trailing comment or a
            # ')' inside a string literal would otherwise walk the
            # window across statement boundaries, letting an adjacent
            # statement's .limit() exempt an unbounded collect. Masking
            # is tokenize-based so triple-quoted (multi-line) strings
            # and f-string parts mask too — a per-line regex misses
            # them and an unbalanced bracket inside a docstring would
            # corrupt the statement walk (ADVICE r8).
            masked = _mask_strings_comments(src, lines)
            for i, line in enumerate(lines, 1):
                if ".collect()" not in line or line.lstrip().startswith("#"):
                    continue
                # same-STATEMENT window (not a fixed line count, which
                # both accepts an adjacent statement's .limit() and
                # misses a chain longer than the window): walk upward
                # while the accumulated text still has unmatched closing
                # brackets or the current line is a continuation
                j = i
                while j > 1 and (i - j) < 40:
                    seg = "\n".join(masked[j - 1:i])
                    unbalanced = seg.count(")") > seg.count("(")
                    cont = masked[j - 1].lstrip().startswith((".", ")"))
                    prev = masked[j - 2].rstrip()
                    opened = prev.endswith(("(", ",", "\\", "=", "+", "["))
                    if unbalanced or cont or opened:
                        j -= 1
                    else:
                        break
                stmt = "\n".join(masked[j - 1:i])
                if _LIMIT_LIT.search(stmt):
                    continue
                func = None
                for s, e, name in spans:
                    if s <= i <= e:
                        func = name  # innermost wins via later overwrite
                key = (rel, func)
                allowed = COLLECT_ALLOWLIST.get(key)
                counts[key] = counts.get(key, 0) + 1
                if allowed is None or counts[key] > allowed[0]:
                    flagged.append((rel, func, i, line.strip()[:120]))
    return flagged


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
