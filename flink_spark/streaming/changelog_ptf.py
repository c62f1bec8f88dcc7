"""FROM_CHANGELOG / TO_CHANGELOG process table functions (reference
docs/content/docs/sql/reference/queries/changelog.md; the built-in PTFs
shipped with the 2.x changelog-conversion surface).

- ``FROM_CHANGELOG``: append-only rows carrying an explicit operation-code
  column → a changelog relation. The op column is interpreted and removed;
  each row gets the engine change operation. In this engine a changelog
  relation is a DataFrame whose first column is the engine ``op`` column
  (``+I``/``-U``/``+U``/``-D`` — the RowKind rendering the whole
  streaming/changelog.py layer uses), so the conversion materializes that
  column explicitly.
- ``TO_CHANGELOG``: a changelog relation → append-only rows with a string
  operation-code column (custom codes via op_mapping; unmapped operations
  are dropped; ``produces_full_deletes => false`` nulls every non-key
  column of DELETE rows).

The two defaults are designed to round-trip: TO_CHANGELOG emits the
standard names INSERT/UPDATE_BEFORE/UPDATE_AFTER/DELETE, which is exactly
FROM_CHANGELOG's default op_mapping.

Scale shape: both conversions are single codegen'd projections (CASE over
the op column) — no shuffle unless PARTITION BY asks for key co-location,
and ORDER BY adds only a within-partition sort after that exchange."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_spark.streaming.changelog import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_AFTER,
    OP_UPDATE_BEFORE,
)

#: Flink change-operation name → engine op symbol
_OP_NAME_TO_SYMBOL = {
    "INSERT": OP_INSERT,
    "UPDATE_BEFORE": OP_UPDATE_BEFORE,
    "UPDATE_AFTER": OP_UPDATE_AFTER,
    "DELETE": OP_DELETE,
}
_SYMBOL_TO_OP_NAME = {v: k for k, v in _OP_NAME_TO_SYMBOL.items()}

#: default FROM_CHANGELOG mapping — the standard names map to themselves
_DEFAULT_FROM_MAPPING = {n: n for n in _OP_NAME_TO_SYMBOL}


def _expand_from_mapping(op_mapping: dict) -> dict:
    """User mapping {code(s) → operation name} → {code → engine symbol};
    comma-separated keys map several codes to one operation; each change
    operation may appear at most once across all entries."""
    seen_ops: set[str] = set()
    out: dict[str, str] = {}
    for codes, op_name in op_mapping.items():
        name = op_name.strip().upper()
        if name not in _OP_NAME_TO_SYMBOL:
            raise ValueError(
                f"FROM_CHANGELOG: unknown change operation {op_name!r} "
                f"(expected one of {sorted(_OP_NAME_TO_SYMBOL)})"
            )
        if name in seen_ops:
            raise ValueError(
                f"FROM_CHANGELOG: change operation {name} mapped more "
                "than once"
            )
        seen_ops.add(name)
        for code in str(codes).split(","):
            code = code.strip()
            if not code:
                continue
            if code in out:
                raise ValueError(
                    f"FROM_CHANGELOG: op code {code!r} mapped more than once"
                )
            out[code] = _OP_NAME_TO_SYMBOL[name]
    return out


def from_changelog(
    df: DataFrame,
    op_col: str = "op",
    op_mapping: dict | None = None,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    error_handling: str = "FAIL",
) -> DataFrame:
    """Append-only rows with an explicit op-code column → changelog
    relation (engine ``op`` first, op-code column removed; with
    PARTITION BY the key columns move to the front, per the reference
    output-schema contract)."""
    if op_col not in df.columns:
        raise ValueError(
            f"FROM_CHANGELOG: op column {op_col!r} not in input "
            f"{df.columns}"
        )
    if error_handling.upper() not in ("FAIL", "SKIP"):
        raise ValueError(
            "FROM_CHANGELOG: error_handling must be 'FAIL' or 'SKIP', "
            f"got {error_handling!r}"
        )
    mapping = _expand_from_mapping(op_mapping or _DEFAULT_FROM_MAPPING)
    if partition_by:
        missing = [c for c in partition_by if c not in df.columns]
        if missing:
            raise ValueError(
                f"FROM_CHANGELOG: PARTITION BY columns {missing} not in "
                "input"
            )
    if order_by:
        if not partition_by:
            raise ValueError(
                "FROM_CHANGELOG: ORDER BY requires PARTITION BY "
                "(set semantics)"
            )
        # the reference buffers per key and flushes in watermark order;
        # the batch bridge realizes the same contract as an exchange on
        # the key plus a within-partition sort
        df = df.repartition(*[F.col(c) for c in partition_by])
        df = df.sortWithinPartitions(*partition_by, *order_by)

    code = F.col(op_col)
    expr = None
    for user_code, symbol in mapping.items():
        branch = F.when(code == F.lit(user_code), F.lit(symbol))
        expr = branch if expr is None else expr.when(
            code == F.lit(user_code), F.lit(symbol)
        )
    if error_handling.upper() == "FAIL":
        expr = expr.otherwise(
            F.raise_error(
                F.concat(
                    F.lit("FROM_CHANGELOG: unmapped op code '"),
                    F.coalesce(code, F.lit("<NULL>")),
                    F.lit("'"),
                )
            )
        )
    out = df.withColumn("__fc_op", expr)
    if error_handling.upper() == "SKIP":
        out = out.filter(F.col("__fc_op").isNotNull())
    keys = list(partition_by or [])
    rest = [c for c in df.columns if c != op_col and c not in keys]
    return out.select(F.col("__fc_op").alias("op"), *keys, *rest)


def to_changelog(
    df: DataFrame,
    op_col: str = "op",
    op_mapping: dict | None = None,
    partition_by: list[str] | None = None,
    produces_full_deletes: bool = True,
) -> DataFrame:
    """Changelog relation → append-only rows with a string op-code column
    named ``op_col``. ``op_mapping`` maps operation name(s) → custom code
    (comma-separated names share a code); when provided, UNMAPPED
    operations are dropped. ``produces_full_deletes=False`` keeps only the
    PARTITION BY key columns on DELETE rows, nulling the rest."""
    has_engine_op = "op" in df.columns
    if not has_engine_op:
        # insert-only table: every row is an INSERT
        df = df.select(F.lit(OP_INSERT).alias("op"), *df.columns)
    if op_mapping is None:
        sym_to_code = dict(_SYMBOL_TO_OP_NAME)
        drop_unmapped = False
    else:
        sym_to_code = {}
        for names, user_code in op_mapping.items():
            for name in str(names).split(","):
                name = name.strip().upper()
                if name not in _OP_NAME_TO_SYMBOL:
                    raise ValueError(
                        f"TO_CHANGELOG: unknown change operation {name!r}"
                    )
                sym = _OP_NAME_TO_SYMBOL[name]
                if sym in sym_to_code:
                    raise ValueError(
                        f"TO_CHANGELOG: change operation {name} mapped "
                        "more than once"
                    )
                sym_to_code[sym] = str(user_code)
        drop_unmapped = True
    if not produces_full_deletes and not partition_by:
        raise ValueError(
            "TO_CHANGELOG: produces_full_deletes => false requires "
            "PARTITION BY (the key columns are what a partial delete keeps)"
        )
    if partition_by:
        missing = [c for c in partition_by if c not in df.columns]
        if missing:
            raise ValueError(
                f"TO_CHANGELOG: PARTITION BY columns {missing} not in input"
            )
        df = df.repartition(*[F.col(c) for c in partition_by])

    sym = F.col("op")
    expr = None
    for symbol, user_code in sym_to_code.items():
        cond = sym == F.lit(symbol)
        expr = (
            F.when(cond, F.lit(user_code)) if expr is None
            else expr.when(cond, F.lit(user_code))
        )
    out = df.withColumn("__tc_code", expr)
    if drop_unmapped:
        out = out.filter(F.col("__tc_code").isNotNull())
    payload = [c for c in df.columns if c != "op"]
    cols = []
    for c in payload:
        if (
            not produces_full_deletes
            and c not in (partition_by or [])
        ):
            cols.append(
                F.when(sym == F.lit(OP_DELETE), F.lit(None)).otherwise(
                    F.col(c)
                ).alias(c)
            )
        else:
            cols.append(F.col(c))
    if op_col in payload:
        raise ValueError(
            f"TO_CHANGELOG: output op column {op_col!r} collides with an "
            "input column — pass op => DESCRIPTOR(<other name>)"
        )
    return out.select(F.col("__tc_code").alias(op_col), *cols)


# -- SQL surface -----------------------------------------------------------

import re as _re

_PTF_CALL_RE = _re.compile(
    r"(?:LATERAL\s+)?(?:TABLE\s*\(\s*)?(?P<fn>FROM_CHANGELOG|TO_CHANGELOG)"
    r"\s*\(",
    _re.IGNORECASE,
)
_INPUT_RE = _re.compile(
    r"^TABLE\s+(?P<tbl>[\w.]+)"
    r"(?:\s+PARTITION\s+BY\s+(?P<pb>\w+(?:\s*,\s*\w+)*))?"
    r"(?:\s+ORDER\s+BY\s+(?P<ob>\w+(?:\s+ASC)?(?:\s*,\s*\w+(?:\s+ASC|\s+DESC)?)*))?$",
    _re.IGNORECASE | _re.DOTALL,
)


def _parse_map_literal(text: str) -> dict:
    from flink_spark.functions.vectorsearch import _split_args

    m = _re.match(r"MAP\s*\[(.*)\]$", text.strip(), _re.IGNORECASE | _re.DOTALL)
    if not m:
        raise ValueError(f"expected MAP['k','v',...], got {text!r}")
    items = [s.strip().strip("'") for s in _split_args(m.group(1))]
    if len(items) % 2:
        raise ValueError("MAP literal needs key/value pairs")
    return dict(zip(items[::2], items[1::2]))


def rewrite_changelog_ptfs(spark, stmt: str) -> str:
    """Replace FROM_CHANGELOG(...) / TO_CHANGELOG(...) FROM-items with
    computed temp views (reference changelog.md SQL spelling — named
    arguments; ``TABLE(...)`` wrapping and LATERAL are optional for these
    PTFs, matching the reference examples which call them bare)."""
    from flink_spark.functions.vectorsearch import (
        _matching_paren,
        _split_args,
    )
    from flink_spark.sqltok import det_digest, mask_literals

    while True:
        masked = mask_literals(stmt)
        m = _PTF_CALL_RE.search(masked)
        if not m:
            return stmt
        fn = m.group("fn").upper()
        open_idx = masked.rindex("(", 0, m.end())
        close_idx = _matching_paren(masked, open_idx)
        end = close_idx + 1
        # consume the optional TABLE( wrapper's close paren
        has_table_wrap = _re.search(
            r"TABLE\s*\(\s*" + fn + r"\s*\($", masked[: open_idx + 1],
            _re.IGNORECASE,
        )
        if has_table_wrap:
            nxt = masked.find(")", end)
            if nxt >= 0:
                end = nxt + 1

        kwargs: dict = {}
        for part in _split_args(stmt[open_idx + 1 : close_idx]):
            if not part.strip():
                continue
            am = _re.match(r"(\w+)\s*=>\s*(.+)$", part.strip(), _re.DOTALL)
            if not am:
                raise ValueError(
                    f"{fn}: arguments must be named (name => value), got "
                    f"{part.strip()!r}"
                )
            kwargs[am.group(1).lower()] = am.group(2).strip()
        if "input" not in kwargs:
            raise ValueError(f"{fn}: missing required argument `input`")
        im = _INPUT_RE.match(kwargs["input"])
        if not im:
            raise ValueError(
                f"{fn}: input must be `TABLE <name> [PARTITION BY cols "
                f"[ORDER BY time]]`, got {kwargs['input']!r}"
            )
        df = spark.table(im.group("tbl"))
        partition_by = (
            [c.strip() for c in im.group("pb").split(",")]
            if im.group("pb") else None
        )
        order_by = (
            [c.strip().split()[0] for c in im.group("ob").split(",")]
            if im.group("ob") else None
        )
        op_col = "op"
        if "op" in kwargs:
            dm = _re.match(r"DESCRIPTOR\s*\(\s*(\w+)\s*\)$", kwargs["op"],
                           _re.IGNORECASE)
            if not dm:
                raise ValueError(f"{fn}: op must be DESCRIPTOR(<col>)")
            op_col = dm.group(1)
        op_mapping = (
            _parse_map_literal(kwargs["op_mapping"])
            if "op_mapping" in kwargs else None
        )
        if fn == "FROM_CHANGELOG":
            eh = kwargs.get("error_handling", "'FAIL'").strip().strip("'")
            out = from_changelog(
                df, op_col=op_col, op_mapping=op_mapping,
                partition_by=partition_by, order_by=order_by,
                error_handling=eh,
            )
        else:
            pfd = kwargs.get("produces_full_deletes", "true").strip().lower()
            if pfd not in ("true", "false"):
                raise ValueError(
                    f"{fn}: produces_full_deletes must be a BOOLEAN "
                    f"literal, got {kwargs['produces_full_deletes']!r}"
                )
            out = to_changelog(
                df, op_col=op_col, op_mapping=op_mapping,
                partition_by=partition_by,
                produces_full_deletes=pfd == "true",
            )
        view = f"__clptf_{det_digest(stmt[m.start():end])}"
        out.createOrReplaceTempView(view)
        stmt = stmt[: m.start()] + view + stmt[end:]
