"""VECTOR_SEARCH SQL table-valued function (reference
StreamExecVectorSearchTableFunction.java, CommonExecVectorSearchTableFunction,
docs/content/docs/sql/reference/queries/vector-search.md).

Flink's spelling:

    -- correlated (per input row):
    SELECT * FROM input_table, LATERAL TABLE(VECTOR_SEARCH(
        TABLE vector_table, input_table.vec_col,
        DESCRIPTOR(index_col), k [, CONFIG => MAP['k','v']]))

    -- constant query vector (LATERAL optional):
    SELECT * FROM TABLE(VECTOR_SEARCH(
        TABLE vector_table, ARRAY[...], DESCRIPTOR(index_col), k))

    -- named arguments:
    VECTOR_SEARCH(SEARCH_TABLE => TABLE t, COLUMN_TO_QUERY => i.v,
                  COLUMN_TO_SEARCH => DESCRIPTOR(c), TOP_K => 10, ...)

Output contract (reference docs "Output"): every column of the input
table, every column of the vector table, plus ``score``. In the reference
the score metric is supplied by the connector's VectorSearchTableSource;
here the engine's vector tables are its own (parquet/view) tables, and
the search executes on flink_spark's similarity library path — cosine
similarity, brute-force exact, broadcast-input × one candidate scan (the
same plan shape as llm/similarity.py brute_force_topk; at 100 TB the
vector side streams once per batch of queries, never materializing the
cross product beyond the per-row running top-k the window prunes).

The rewrite replaces ``input, LATERAL TABLE(VECTOR_SEARCH(...))`` (or the
standalone ``TABLE(VECTOR_SEARCH(...))``) with a temp view computed by
DataFrame ops, so any outer SELECT/WHERE/window composes over it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_spark.sqltok import det_digest, mask_literals, split_top_commas

# LATERAL correlated form, capturing the preceding input-table reference
_VS_LATERAL_RE = re.compile(
    r"(?:\bFROM|,)\s+(?P<input>[\w.]+)(?:\s+(?:AS\s+)?(?P<alias>\w+))?\s*,\s*"
    r"LATERAL\s+TABLE\s*\(\s*VECTOR_SEARCH\s*\(",
    re.IGNORECASE,
)
# standalone form (constant query vector)
_VS_PLAIN_RE = re.compile(
    r"(?:LATERAL\s+)?TABLE\s*\(\s*VECTOR_SEARCH\s*\(", re.IGNORECASE
)

_RESERVED_HEADS = {"select", "from", "where", "group", "order", "values"}


def _matching_paren(masked: str, open_idx: int) -> int:
    depth = 0
    for i in range(open_idx, len(masked)):
        if masked[i] == "(":
            depth += 1
        elif masked[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError("VECTOR_SEARCH: unbalanced parentheses")


def _split_args(body: str) -> list[str]:
    """Top-level comma split tracking BOTH () and [] depth (ARRAY[...]
    and MAP[...] literals carry commas that split_top_commas, which only
    tracks parens, would break on)."""
    masked = mask_literals(body)
    parts, last, depth = [], 0, 0
    for i, c in enumerate(masked):
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(body[last:i])
            last = i + 1
    parts.append(body[last:])
    return [p.strip() for p in parts]


def _parse_args(arg_body: str) -> dict:
    """Positional or named (NAME => value) argument list →
    {search_table, column_to_query, column_to_search, top_k, config}."""
    parts = [p.strip() for p in _split_args(arg_body) if p.strip()]
    order = ["search_table", "column_to_query", "column_to_search", "top_k",
             "config"]
    out: dict = {}
    for i, p in enumerate(parts):
        m = re.match(r"(\w+)\s*=>\s*(.+)$", p, re.DOTALL)
        if m:
            key = m.group(1).lower()
            if key not in order:
                raise ValueError(f"VECTOR_SEARCH: unknown argument {m.group(1)!r}")
            out[key] = m.group(2).strip()
        else:
            if i >= len(order):
                raise ValueError("VECTOR_SEARCH: too many arguments")
            out[order[i]] = p
    for req in order[:4]:
        if req not in out:
            raise ValueError(f"VECTOR_SEARCH: missing argument {req.upper()}")
    tm = re.match(r"TABLE\s+([\w.]+)$", out["search_table"], re.IGNORECASE)
    if not tm:
        raise ValueError(
            "VECTOR_SEARCH: SEARCH_TABLE must be `TABLE <name>`, got "
            f"{out['search_table']!r}"
        )
    out["search_table"] = tm.group(1)
    dm = re.match(
        r"DESCRIPTOR\s*\(\s*(\w+)\s*\)$", out["column_to_search"], re.IGNORECASE
    )
    if not dm:
        raise ValueError(
            "VECTOR_SEARCH: COLUMN_TO_SEARCH must be DESCRIPTOR(<col>)"
        )
    out["column_to_search"] = dm.group(1)
    km = re.match(r"(\d+)$", out["top_k"])
    if not km:
        raise ValueError(f"VECTOR_SEARCH: TOP_K must be a literal int, got "
                         f"{out['top_k']!r}")
    out["top_k"] = int(km.group(1))
    if "config" in out:
        cm = re.match(r"MAP\s*\[(.*)\]$", out["config"], re.IGNORECASE | re.DOTALL)
        if not cm:
            raise ValueError("VECTOR_SEARCH: CONFIG must be MAP['k','v',...]")
        items = [
            s.strip().strip("'") for s in _split_args(cm.group(1))
        ]
        if len(items) % 2:
            raise ValueError("VECTOR_SEARCH: CONFIG map needs key/value pairs")
        out["config"] = dict(zip(items[::2], items[1::2]))
    return out


def _cosine(a_expr: str, b_expr: str):
    """JVM-side cosine similarity over two array SQL expressions (the
    similarity library's fold — sequential, matching the DuckDB oracle)."""
    from flink_spark.llm.similarity import cosine

    return cosine(a_expr, b_expr)


def _ann_search(
    spark,
    input_df: DataFrame | None,
    query_col_or_expr: str,
    vt: DataFrame,
    index_col: str,
    k: int,
    config: dict,
) -> DataFrame:
    """Approximate path: CONFIG MAP['index','lsh'|'ivf'|'pq'] routes the
    TVF to the ANN library (llm/similarity.py) instead of the exact brute
    scan — the 100-TB spelling, where scoring every candidate per query
    stops being an option. Output shape matches the brute path (all
    columns of both tables + score); ranking is approximate, recall
    gated ≥0.8 in tests/test_vectorsearch.py."""
    from flink_spark.llm import similarity as sim

    index = config["index"].lower()
    fns = {"lsh": sim.lsh_topk, "ivf": sim.ivf_topk, "pq": sim.pq_topk}
    if index not in fns:
        raise ValueError(
            f"VECTOR_SEARCH: unknown index {index!r} "
            "(supported: brute, lsh, ivf, pq)"
        )
    vt_cols = vt.columns
    # stable surrogate ids on both sides: the id must not change between
    # the top-k pass and the join-back, so pin the assignment (at real
    # scale the table's own key column plays this role)
    cand = vt.withColumn(
        "__vs_cid", F.monotonically_increasing_id()
    ).localCheckpoint(eager=True)
    if input_df is not None:
        q_full = input_df.withColumn(
            "__vs_rid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=True)
        q_vec = q_full.select(
            "__vs_rid", F.col(query_col_or_expr).alias("__vs_emb")
        )
    else:
        q_full = None
        q_vec = spark.range(1).select(
            F.lit(0).cast("long").alias("__vs_rid"),
            F.expr(query_col_or_expr).alias("__vs_emb"),
        )
    kwargs: dict = {}
    if index == "lsh":
        dim_row = vt.select(F.size(F.col(index_col))).first()
        kwargs["dim"] = int(dim_row[0]) if dim_row else 64
        if "lsh.planes" in config:
            kwargs["n_planes"] = int(config["lsh.planes"])
        if "lsh.tables" in config:
            kwargs["n_tables"] = int(config["lsh.tables"])
    elif index == "ivf":
        if "ivf.centroids" in config:
            kwargs["n_centroids"] = int(config["ivf.centroids"])
        if "ivf.probe" in config:
            kwargs["n_probe"] = int(config["ivf.probe"])
        if "ivf.assign" in config:
            kwargs["n_assign"] = int(config["ivf.assign"])
    elif index == "pq":
        if "pq.m" in config:
            kwargs["m"] = int(config["pq.m"])
        if "pq.ks" in config:
            kwargs["ks"] = int(config["pq.ks"])
    top = fns[index](
        q_vec,
        cand.select("__vs_cid", F.col(index_col).alias("__vs_emb")),
        k=k,
        query_id="__vs_rid",
        cand_id="__vs_cid",
        vec="__vs_emb",
        **kwargs,
    )
    top = top.select(
        "__vs_rid", "__vs_cid", F.col("cos_sim").alias("__vs_score")
    )
    if q_full is not None:
        return (
            top.join(q_full, "__vs_rid")
            .join(cand, "__vs_cid")
            .select(*input_df.columns, *vt_cols,
                    F.col("__vs_score").alias("score"))
        )
    return (
        top.join(cand, "__vs_cid")
        .select(*vt_cols, F.col("__vs_score").alias("score"))
    )


def _search(
    spark,
    input_df: DataFrame | None,
    query_col_or_expr: str,
    vt: DataFrame,
    index_col: str,
    k: int,
    config: dict | None = None,
) -> DataFrame:
    if config:
        # reference vector_search_runtime_config: async/timeout/
        # max-concurrent-operations are serving-mode hints — the scan
        # here is an inherently parallel broadcast join, so they are
        # accepted and moot; 'index' routes to the ANN library; anything
        # else is a typo worth failing loudly on
        unknown = {
            k
            for k in config
            if k not in ("index", "async", "timeout",
                         "max-concurrent-operations", "output-mode")
            # index-scoped tuning keys ('lsh.bands', 'ivf.probe',
            # 'pq.codebooks', ...) route to the ANN library untouched
            and not k.startswith(("lsh.", "ivf.", "pq."))
        }
        if unknown:
            raise ValueError(
                f"VECTOR_SEARCH: unsupported config options "
                f"{sorted(unknown)} (supported: index, async, timeout, "
                "max-concurrent-operations, and lsh./ivf./pq.-prefixed "
                "index tuning keys)"
            )
        om = str(config.get("output-mode", "ORDERED")).upper()
        if om not in ("ORDERED", "ALLOW_UNORDERED"):
            raise ValueError(
                f"VECTOR_SEARCH: output-mode must be ORDERED or "
                f"ALLOW_UNORDERED, got {om!r}"
            )
    if config and config.get("index", "brute").lower() != "brute":
        # exact brute scan stays the default; CONFIG opts into the ANN
        # library (reference vector_search.md CONFIG map)
        if input_df is not None:
            dup = set(input_df.columns) & set(vt.columns)
            if dup:
                raise ValueError(
                    f"VECTOR_SEARCH: ambiguous output columns "
                    f"{sorted(dup)} — project/rename one side first"
                )
        return _ann_search(
            spark, input_df, query_col_or_expr, vt, index_col, k, config
        )
    vt_cols = vt.columns
    if input_df is not None:
        dup = set(input_df.columns) & set(vt_cols)
        if dup:
            raise ValueError(
                f"VECTOR_SEARCH: ambiguous output columns {sorted(dup)} — "
                "project/rename one side first (the reference output keeps "
                "ALL columns of both tables plus `score`)"
            )
        inp = input_df.withColumn("__vs_rid", F.monotonically_increasing_id())
        scored = F.broadcast(inp).crossJoin(vt).withColumn(
            "__vs_score", _cosine(query_col_or_expr, index_col)
        )
        w = Window.partitionBy("__vs_rid").orderBy(
            F.desc("__vs_score"), *[F.asc(c) for c in vt_cols]
        )
        return (
            scored.withColumn("__vs_rn", F.row_number().over(w))
            .filter(F.col("__vs_rn") <= k)
            .select(*input_df.columns, *vt_cols,
                    F.col("__vs_score").alias("score"))
        )
    # single (constant) query vector: orderBy+limit lowers to
    # TakeOrderedAndProject — per-partition top-k then a k-row merge at
    # the driver, no single-partition window shuffle
    scored = vt.withColumn(
        "__vs_score", _cosine(query_col_or_expr, index_col)
    )
    return (
        scored.orderBy(F.desc("__vs_score"), *[F.asc(c) for c in vt_cols])
        .limit(k)
        .select(*vt_cols, F.col("__vs_score").alias("score"))
    )


def rewrite_vector_search(spark, stmt: str) -> str:
    """Replace every VECTOR_SEARCH TVF call in ``stmt`` with a computed
    temp view; returns the rewritten statement (possibly unchanged)."""
    while True:
        masked = mask_literals(stmt)
        lm = _VS_LATERAL_RE.search(masked)
        if lm and lm.group("input").split(".")[-1].lower() not in _RESERVED_HEADS:
            open_idx = masked.rindex("(", 0, lm.end())
            close_idx = _matching_paren(masked, open_idx)
            # the span to replace runs through the LATERAL TABLE(...) outer
            # close paren
            outer_close = masked.index(")", close_idx + 1)
            args = _parse_args(stmt[open_idx + 1 : close_idx])
            input_name = lm.group("input")
            alias = lm.group("alias")
            qm = re.match(r"(?:(\w+)\.)?(\w+)$", args["column_to_query"])
            if not qm:
                raise ValueError(
                    "VECTOR_SEARCH: correlated COLUMN_TO_QUERY must be "
                    f"[table.]column, got {args['column_to_query']!r}"
                )
            qual, qcol = qm.group(1), qm.group(2)
            if qual and qual not in (input_name, alias or input_name):
                raise ValueError(
                    f"VECTOR_SEARCH: query column qualifier {qual!r} does "
                    f"not match the correlated input {input_name!r}"
                )
            inp = spark.table(input_name)
            vt = spark.table(args["search_table"])
            out = _search(
                spark, inp, qcol, vt, args["column_to_search"],
                args["top_k"], config=args.get("config"),
            )
            view = f"__vs_{det_digest(stmt[lm.start('input'):outer_close + 1])}"
            out.createOrReplaceTempView(view)
            repl = view + (f" {alias}" if alias else "")
            stmt = stmt[: lm.start('input')] + repl + stmt[outer_close + 1 :]
            continue
        pm = _VS_PLAIN_RE.search(masked)
        if pm:
            open_idx = masked.rindex("(", 0, pm.end())
            close_idx = _matching_paren(masked, open_idx)
            outer_close = masked.index(")", close_idx + 1)
            args = _parse_args(stmt[open_idx + 1 : close_idx])
            qexpr = args["column_to_query"]
            am = re.match(r"ARRAY\s*\[(.*)\]$", qexpr, re.IGNORECASE | re.DOTALL)
            if am:
                qexpr = f"array({am.group(1)})"
            vt = spark.table(args["search_table"])
            out = _search(
                spark, None, qexpr, vt, args["column_to_search"],
                args["top_k"], config=args.get("config"),
            )
            view = f"__vs_{det_digest(stmt[pm.start():outer_close + 1])}"
            out.createOrReplaceTempView(view)
            stmt = stmt[: pm.start()] + view + stmt[outer_close + 1 :]
            continue
        return stmt
