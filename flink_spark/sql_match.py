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
                                                  -- also (A|B) alternation,
                                                  -- {- X -} exclusion,
                                                  -- PERMUTE (A, B, ...)
        [WITHIN INTERVAL '<n>' <unit>]
        [SUBSET U = (A, B) [, ...]]               -- union variables
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
    SKIP_TO_FIRST,
    SKIP_TO_LAST,
    SKIP_TO_NEXT_ROW,
    Pattern,
    match_pattern,
)

MATCH_RE = re.compile(
    r"^\s*SELECT\s+\*\s+FROM\s+(?P<tbl>[\w.]+)\s+MATCH_RECOGNIZE\s*\(\s*"
    r"PARTITION\s+BY\s+(?P<part>[\w,\s]+?)\s+"
    r"ORDER\s+BY\s+(?P<order>[\w,\s]+?)\s+"
    r"MEASURES\s+(?P<measures>.+?)\s+"
    r"(?:(?P<rowsmode>ONE\s+ROW|ALL\s+ROWS)\s+PER\s+MATCH\s+)?"
    r"(?:AFTER\s+MATCH\s+SKIP\s+(?P<skip>PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW"
    r"|TO\s+(?:FIRST|LAST)\s+\w+)\s+)?"
    r"PATTERN\s*\(\s*(?P<pattern>(?:[^()]|\([^()]*\))+?)\s*\)\s*"
    r"(?:WITHIN\s+INTERVAL\s+'(?P<wn>[\d.]+)'\s+(?P<wu>\w+)\s*)?"
    r"(?:SUBSET\s+(?P<subset>\w+\s*=\s*\([^()]*\)"
    r"(?:\s*,\s*\w+\s*=\s*\([^()]*\))*)\s*)?"
    r"(?:DEFINE\s+(?P<define>.+?)\s*)?"
    r"\)\s*(?:AS\s+\w+\s*)?$",
    re.IGNORECASE | re.DOTALL,
)

#: SUBSET clause entries: ``U = (A, B)`` (Calcite SqlMatchRecognize
#: subsetList; Flink MatchCodeGenerator resolves union variables in
#: MEASURES against the member set).
_SUBSET_RE = re.compile(r"(?P<name>\w+)\s*=\s*\(\s*(?P<members>[\w,\s]+?)\s*\)")

#: PATTERN tokens: a variable or an alternation group ``(A|B)``, followed
#: by an optional quantifier ``+ * ? {n} {n,} {n,m}`` and an optional
#: reluctance marker ``?`` (reference Calcite SqlMatchRecognize pattern
#: grammar; quantifier semantics in flink-cep pattern/Quantifier.java).
_PAT_TOKEN_RE = re.compile(
    r"\s*(?:\(\s*(?P<group>\w+(?:\s*\|\s*\w+)+)\s*\)|(?P<var>\w+))"
    r"(?P<quant>\{\d+(?:\s*,\s*\d*)?\}|[+*?])?(?P<reluctant>\?)?"
)

_MEASURE_RE = re.compile(
    r"^\s*(?:(?P<fn>FIRST|LAST|COUNT)\s*\(\s*)?(?P<var>\w+)\.(?P<col>\w+|\*)\s*"
    r"\)?\s+AS\s+(?P<name>\w+)\s*$",
    re.IGNORECASE,
)

#: CLASSIFIER() / MATCH_NUMBER() measures (Calcite SqlMatchRecognize
#: built-ins; Flink MatchCodeGenerator.scala classifier/matchNumber).
_SPECIAL_MEASURE_RE = re.compile(
    r"^\s*(?P<fn>CLASSIFIER|MATCH_NUMBER)\s*\(\s*\)\s+AS\s+(?P<name>\w+)\s*$",
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


def _parse_pattern(pattern_text: str, defines: dict):
    """Tokenize PATTERN: variables / alternation groups, each with an
    optional quantifier (+ * ? {n} {n,} {n,m}) and reluctance marker.
    Also handles ``PERMUTE (A, B, ...)`` (expanded to the permutation
    alternatives in declaration order, as Calcite does) and SQL:2016
    exclusion ``{- X -}`` (matched but omitted from ALL ROWS output).

    Returns (pattern-or-list-of-patterns, excluded-variable set)."""

    def where_of(var: str):
        return (
            _sql_bool_to_python(defines[var], var)
            if var in defines
            else (lambda row: True)
        )

    text = pattern_text.strip()

    pm = re.match(r"PERMUTE\s*\(\s*([\w,\s]+?)\s*\)\s*$", text, re.IGNORECASE)
    if pm:
        from itertools import permutations

        names = [v.strip().upper() for v in pm.group(1).split(",")]
        variants = []
        for perm in permutations(names):
            p = Pattern.begin(perm[0], where_of(perm[0]))
            for v in perm[1:]:
                p = p.next(v, where_of(v))
            variants.append(p)
        return variants, set()

    excluded: set[str] = set()

    def _strip_exclusion(mo: re.Match) -> str:
        inner = mo.group(1)
        excluded.update(v.upper() for v in re.findall(r"[A-Za-z_]\w*", inner))
        return f" {inner} "

    text = re.sub(r"\{-\s*((?:[^-]|-(?!\}))*?)\s*-\}", _strip_exclusion, text)

    pat = None
    pos = 0
    while pos < len(text):
        tok = _PAT_TOKEN_RE.match(text, pos)
        if not tok or tok.end() == pos:
            raise ValueError(f"unsupported PATTERN syntax at: {text[pos:]!r}")
        pos = tok.end()
        if tok.group("group"):
            names = [v.strip().upper() for v in tok.group("group").split("|")]
            alts = [(v, where_of(v)) for v in names]
            pat = Pattern.begin_any(alts) if pat is None else pat.next_any(alts)
        else:
            var = tok.group("var").upper()
            pat = (
                Pattern.begin(var, where_of(var))
                if pat is None
                else pat.next(var, where_of(var))
            )
        quant = tok.group("quant") or ""
        greedy = not tok.group("reluctant")
        if quant == "+":
            pat = pat.one_or_more(greedy=greedy)
        elif quant == "*":
            pat = pat.zero_or_more(greedy=greedy)
        elif quant == "?":
            pat = pat.optional()
        elif quant.startswith("{"):
            inner = quant[1:-1]
            if "," in inner:
                lo, hi = (p.strip() for p in inner.split(","))
                pat = pat.times(int(lo), int(hi) if hi else None, greedy=greedy)
            else:
                pat = pat.times(int(inner), greedy=greedy)
    if pat is None:
        raise ValueError("empty PATTERN")
    return pat, excluded


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

    pat, excluded = _parse_pattern(m.group("pattern"), defines)
    if m.group("wn"):
        unit = m.group("wu").lower()
        span = f"{m.group('wn')} {unit}{'' if unit.endswith('s') else 's'}"
        for p in (pat if isinstance(pat, list) else [pat]):
            p.within(span)

    subsets: dict[str, list[str]] = {}
    if m.group("subset"):
        for sm in _SUBSET_RE.finditer(m.group("subset")):
            subsets[sm.group("name").upper()] = [
                v.strip().upper() for v in sm.group("members").split(",")
            ]

    skip_txt = (m.group("skip") or "").split()
    if [t.upper() for t in skip_txt[:2]] == ["TO", "FIRST"]:
        skip = (SKIP_TO_FIRST, skip_txt[2])
    elif [t.upper() for t in skip_txt[:2]] == ["TO", "LAST"]:
        skip = (SKIP_TO_LAST, skip_txt[2])
    elif [t.upper() for t in skip_txt[:2]] == ["TO", "NEXT"]:
        skip = SKIP_TO_NEXT_ROW
    else:
        skip = SKIP_PAST_LAST_ROW
    long_df = match_pattern(
        spark.table(m.group("tbl")),
        pat,
        key_cols=part_cols,
        ts_col=order_cols[0],
        order_cols=order_cols,
        skip=skip,
    )

    all_rows = bool(
        m.group("rowsmode") and m.group("rowsmode").upper().startswith("ALL")
    )
    measures = _split_top_level_commas(m.group("measures"))
    if all_rows:
        return _all_rows_per_match(long_df, part_cols, measures, subsets,
                                   excluded)
    return _one_row_per_match(long_df, part_cols, measures, subsets)


def _var_predicate(var: str, subsets: dict[str, list[str]]):
    """``var`` may be a pattern variable or a SUBSET union variable — the
    latter matches any of its members (Calcite subsetList resolution)."""
    members = subsets.get(var)
    return F.col("var").isin(members) if members else (F.col("var") == var)


def _one_row_per_match(long_df, part_cols, measures, subsets=None) -> DataFrame:
    """MEASURES over the long-format match relation: per (partition,
    match) aggregation — FINAL semantics, as ONE ROW PER MATCH implies."""
    subsets = subsets or {}
    aggs = []
    for piece in measures:
        sm = _SPECIAL_MEASURE_RE.match(piece)
        if sm:
            fn, name = sm.group("fn").upper(), sm.group("name")
            if fn == "MATCH_NUMBER":
                aggs.append(F.first("match_id").alias(name))
            else:  # CLASSIFIER(): the last row's pattern variable
                aggs.append(F.max_by("var", "seq_no").alias(name))
            continue
        mm = _MEASURE_RE.match(piece)
        if not mm:
            raise ValueError(f"unsupported MEASURES clause: {piece!r}")
        fn = (mm.group("fn") or "LAST").upper()
        var, col, name = mm.group("var").upper(), mm.group("col"), mm.group("name")
        isvar = _var_predicate(var, subsets)
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


def _all_rows_per_match(long_df, part_cols, measures, subsets=None,
                        excluded=None) -> DataFrame:
    """ALL ROWS PER MATCH: one output row per matched event, measures
    evaluated with RUNNING semantics (SQL:2016 / Calcite default inside
    ALL ROWS PER MATCH; Flink MatchCodeGenerator running aggregates) — a
    window over the match's rows up to the current one. The window
    partitions on (partition keys, match_id), so it sees |match| rows,
    never the fact table. Rows matched by ``{- X -}``-excluded variables
    still feed the running measures but are omitted from the output
    (SQL:2016 exclusion semantics)."""
    from pyspark.sql import Window

    subsets = subsets or {}
    excluded = excluded or set()

    w = (
        Window.partitionBy(*part_cols, "match_id")
        .orderBy("seq_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = long_df
    names = []
    for piece in measures:
        sm = _SPECIAL_MEASURE_RE.match(piece)
        if sm:
            fn, name = sm.group("fn").upper(), sm.group("name")
            col = F.col("match_id") if fn == "MATCH_NUMBER" else F.col("var")
            out = out.withColumn(name, col)
            names.append(name)
            continue
        mm = _MEASURE_RE.match(piece)
        if not mm:
            raise ValueError(f"unsupported MEASURES clause: {piece!r}")
        fn = (mm.group("fn") or "LAST").upper()
        var, col, name = mm.group("var").upper(), mm.group("col"), mm.group("name")
        isvar = _var_predicate(var, subsets)
        if fn == "COUNT":
            expr = F.sum(F.when(isvar, 1).otherwise(0)).over(w)
        elif fn == "FIRST":
            expr = F.min_by(
                F.when(isvar, F.col(col)), F.when(isvar, F.col("seq_no"))
            ).over(w)
        else:  # RUNNING LAST
            expr = F.max_by(
                F.when(isvar, F.col(col)), F.when(isvar, F.col("seq_no"))
            ).over(w)
        out = out.withColumn(name, expr)
        names.append(name)
    if excluded:
        out = out.filter(~F.col("var").isin(sorted(excluded)))
    # SQL:2016 ALL ROWS PER MATCH output: the input row, plus measures.
    base = [c for c in long_df.columns if c not in ("match_id", "var", "seq_no")]
    return out.select(*base, *names)
