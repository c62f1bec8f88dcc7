"""MATCH_RECOGNIZE SQL front-end over the CEP engine (SURVEY §2.11;
reference StreamExecMatch.java:61, MatchCodeGenerator.scala, SQL parsing in
Calcite's SqlMatchRecognize).

Supported subset (documented contract, mirrors the common Flink usage):

    SELECT * FROM <table> MATCH_RECOGNIZE (
        PARTITION BY k [, ...]
        ORDER BY ts
        MEASURES FIRST(A.col) AS x, LAST(B.col) AS y, COUNT(B.*) AS n,
                 A.col AS z                       -- bare var.col = LAST
        [ONE ROW PER MATCH]
        [AFTER MATCH SKIP (PAST LAST ROW | TO NEXT ROW)]
        PATTERN (A B+ C? D*)                      -- strict contiguity
        [WITHIN INTERVAL '<n>' <unit>]
        DEFINE A AS <boolean expr over A.*>, B AS ...
    )

DEFINE predicates may reference only the defining variable's columns
(prefix ``Var.``); comparisons, AND/OR/NOT, and literals are translated to
Python and evaluated per row (the reference compiles them to Java codegen —
same semantics, different backend). Variables without a DEFINE match any
row (Flink's `TRUE` default).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_spark.operators.cep import (
    SKIP_PAST_LAST_ROW,
    SKIP_TO_NEXT_ROW,
    Pattern,
    match_pattern,
)

MATCH_RE = re.compile(
    r"^\s*SELECT\s+\*\s+FROM\s+(?P<tbl>[\w.]+)\s+MATCH_RECOGNIZE\s*\(\s*"
    r"PARTITION\s+BY\s+(?P<part>[\w,\s]+?)\s+"
    r"ORDER\s+BY\s+(?P<order>[\w,\s]+?)\s+"
    r"MEASURES\s+(?P<measures>.+?)\s+"
    r"(?:ONE\s+ROW\s+PER\s+MATCH\s+)?"
    r"(?:AFTER\s+MATCH\s+SKIP\s+(?P<skip>PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW)\s+)?"
    r"PATTERN\s*\(\s*(?P<pattern>[^)]+?)\s*\)\s*"
    r"(?:WITHIN\s+INTERVAL\s+'(?P<wn>[\d.]+)'\s+(?P<wu>\w+)\s*)?"
    r"(?:DEFINE\s+(?P<define>.+?)\s*)?"
    r"\)\s*(?:AS\s+\w+\s*)?$",
    re.IGNORECASE | re.DOTALL,
)

_MEASURE_RE = re.compile(
    r"^\s*(?:(?P<fn>FIRST|LAST|COUNT)\s*\(\s*)?(?P<var>\w+)\.(?P<col>\w+|\*)\s*"
    r"\)?\s+AS\s+(?P<name>\w+)\s*$",
    re.IGNORECASE,
)


#: AST whitelist for DEFINE predicates: boolean logic, comparisons, basic
#: arithmetic, bare column names, literals. Notably NO Attribute / Call /
#: Subscript nodes — that closes the classic ``().__class__...`` escape, so
#: untrusted SQL text cannot reach arbitrary Python even though the
#: validated expression is then executed with compile/eval (the reference
#: path is Calcite codegen, which has the same property by construction).
_ALLOWED_AST_NODES = (
    "Expression", "BoolOp", "And", "Or", "UnaryOp", "Not", "USub", "UAdd",
    "Compare", "Eq", "NotEq", "Lt", "LtE", "Gt", "GtE", "Is", "IsNot",
    "BinOp", "Add", "Sub", "Mult", "Div", "Mod", "Name", "Load", "Constant",
)


def _validate_predicate_ast(e: str, origin: str) -> None:
    import ast

    tree = ast.parse(e, mode="eval")
    for node in ast.walk(tree):
        kind = type(node).__name__
        if kind not in _ALLOWED_AST_NODES:
            raise ValueError(
                f"unsupported construct {kind!r} in MATCH_RECOGNIZE DEFINE "
                f"predicate {origin!r} — only comparisons, boolean logic, "
                "+-*/% arithmetic, column names and literals are allowed"
            )


def _sql_bool_to_python(expr: str, var: str):
    """Translate a restricted SQL boolean over ``var.col`` refs into a
    compiled Python predicate over a row dict. The translated source is
    AST-validated against a strict whitelist before compilation."""
    e = re.sub(rf"\b{var}\.(\w+)", r"\1", expr)
    e = re.sub(r"<>", "!=", e)
    e = re.sub(r"(?<![<>=!])=(?!=)", "==", e)
    e = re.sub(r"\bAND\b", "and", e, flags=re.IGNORECASE)
    e = re.sub(r"\bOR\b", "or", e, flags=re.IGNORECASE)
    e = re.sub(r"\bNOT\b", "not", e, flags=re.IGNORECASE)
    e = re.sub(r"\bNULL\b", "None", e, flags=re.IGNORECASE)
    _validate_predicate_ast(e, expr)
    code = compile(e, f"<define:{var}>", "eval")
    names = sorted(
        {n for n in code.co_names if n not in ("and", "or", "not", "None")}
    )

    def pred(row, _code=code, _names=names):
        env = {n: row.get(n) for n in _names}
        try:
            return bool(eval(_code, {"__builtins__": {}}, env))
        except TypeError:  # NULL in a comparison → no match (SQL 3VL)
            return False

    return pred


def _split_top_level_commas(text: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def rewrite_match_recognize(spark, m: re.Match) -> DataFrame:
    part_cols = [c.strip() for c in m.group("part").split(",")]
    order_cols = [c.strip() for c in m.group("order").split(",")]
    defines = {}
    if m.group("define"):
        for d in _split_top_level_commas(m.group("define")):
            dm = re.match(r"(\w+)\s+AS\s+(.+)", d, re.IGNORECASE | re.DOTALL)
            if not dm:
                raise ValueError(f"unsupported DEFINE clause: {d!r}")
            defines[dm.group(1).upper()] = dm.group(2).strip()

    # PATTERN (A B+ C? D*) — strict contiguity, greedy quantifiers
    pat = None
    for tok in m.group("pattern").split():
        quant = ""
        if tok[-1] in "+*?":
            tok, quant = tok[:-1], tok[-1]
        var = tok.upper()
        where = (
            _sql_bool_to_python(defines[var], tok)
            if var in defines
            else (lambda row: True)
        )
        pat = Pattern.begin(var, where) if pat is None else pat.next(var, where)
        if quant == "+":
            pat = pat.one_or_more(greedy=True)
        elif quant == "*":
            pat = pat.zero_or_more(greedy=True)
        elif quant == "?":
            pat = pat.optional()
    if m.group("wn"):
        unit = m.group("wu").lower()
        pat = pat.within(f"{m.group('wn')} {unit}{'' if unit.endswith('s') else 's'}")

    skip = (
        SKIP_TO_NEXT_ROW
        if m.group("skip") and "NEXT" in m.group("skip").upper()
        else SKIP_PAST_LAST_ROW
    )
    long_df = match_pattern(
        spark.table(m.group("tbl")),
        pat,
        key_cols=part_cols,
        ts_col=order_cols[0],
        order_cols=order_cols,
        skip=skip,
    )

    # MEASURES over the long-format match relation: per (partition, match)
    aggs = []
    for piece in _split_top_level_commas(m.group("measures")):
        mm = _MEASURE_RE.match(piece)
        if not mm:
            raise ValueError(f"unsupported MEASURES clause: {piece!r}")
        fn = (mm.group("fn") or "LAST").upper()
        var, col, name = mm.group("var").upper(), mm.group("col"), mm.group("name")
        isvar = F.col("var") == var
        if fn == "COUNT":
            aggs.append(F.sum(F.when(isvar, 1).otherwise(0)).alias(name))
        elif fn == "FIRST":
            aggs.append(
                F.min_by(F.when(isvar, F.col(col)), F.when(isvar, F.col("seq_no")))
                .alias(name)
            )
        else:  # LAST (also the bare Var.col default, as in Flink)
            aggs.append(
                F.max_by(F.when(isvar, F.col(col)), F.when(isvar, F.col("seq_no")))
                .alias(name)
            )
    return long_df.groupBy(*part_cols, "match_id").agg(*aggs).drop("match_id")
