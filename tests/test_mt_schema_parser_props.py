"""Property tests for the materialized-table schema-item grammar
(flink_spark/materialized.py _parse_schema_items; reference spellings
pinned by flink-sql-parser MaterializedTableStatementParserTest.java).

Strategy: generate structured items, RENDER them to DDL text, parse the
text back, and assert the structure round-trips — the same render→parse
fuzz discipline the row-level DML property test uses. Stresses the
top-level splitter (commas inside type params, computed expressions and
quoted comments), the optional-clause orderings, and position suffixes.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from flink_spark.materialized import _parse_schema_items

NAMES = st.from_regex(r"[a-z][a-z0-9_]{0,7}", fullmatch=True)
TYPES = st.sampled_from([
    "INT", "BIGINT", "STRING", "DOUBLE", "BOOLEAN",
    "DECIMAL(10,2)", "DECIMAL(38, 4)", "ARRAY<INT>",
    "MAP<STRING, BIGINT>", "ROW(f0 INT, f1 STRING)", "TIMESTAMP(3)",
])
# expressions that stress the splitter: nested parens, commas inside
# calls and inside string literals, operators
EXPRS = st.sampled_from([
    "a + 1", "a * (b + 2)", "coalesce(a, b, 0)",
    "concat(a, 'x,y')", "round(a / b, 2)", "coalesce(a, '(,')",
])
COMMENTS = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters="'\\\r\n",
        categories=("L", "N", "P", "Zs"),
    ),
    min_size=0, max_size=12,
)


@st.composite
def column_item(draw, name):
    kind = draw(st.sampled_from(["physical", "computed", "metadata"]))
    comment = draw(st.none() | COMMENTS)
    pos = draw(st.none() | st.sampled_from(["first", "after"]))
    after_ref = draw(NAMES) if pos == "after" else None
    if kind == "computed":
        expr = draw(EXPRS)
        text = f"{name} AS {expr}"
        item = {"kind": "computed", "name": name, "expr": expr}
    else:
        typ = draw(TYPES)
        notnull = draw(st.booleans()) if kind == "physical" else False
        text = f"{name} {typ}"
        if notnull:
            text += " NOT NULL"
        item = {"kind": kind, "name": name, "type": typ}
        if kind == "metadata":
            mdkey = draw(st.none() | st.from_regex(r"[a-z.]{1,8}",
                                                   fullmatch=True))
            virtual = draw(st.booleans())
            text += " METADATA"
            if mdkey:
                text += f" FROM '{mdkey}'"
            if virtual:
                text += " VIRTUAL"
            item["mdkey"] = mdkey
            item["virtual"] = virtual
    if comment is not None:
        text += f" COMMENT '{comment}'"
    if pos == "first":
        text += " FIRST"
    elif pos == "after":
        text += f" AFTER {after_ref}"
    item["comment"] = comment
    item["pos"] = (None if pos is None
                   else "first" if pos == "first" else ("after", after_ref))
    return text, item


@st.composite
def schema_block(draw):
    names = draw(st.lists(NAMES, min_size=1, max_size=5, unique=True))
    rendered, expected = [], []
    for n in names:
        t, it = draw(column_item(n))
        rendered.append(t)
        expected.append(it)
    if draw(st.booleans()):
        wm_col = draw(NAMES)
        expr = draw(EXPRS)
        rendered.append(f"WATERMARK FOR {wm_col} AS {expr}")
        expected.append({"kind": "watermark", "col": wm_col, "expr": expr})
    if draw(st.booleans()):
        pk_cols = draw(st.lists(NAMES, min_size=1, max_size=3, unique=True))
        cname = draw(st.none() | NAMES)
        prefix = f"CONSTRAINT {cname} " if cname else ""
        rendered.append(
            prefix + f"PRIMARY KEY ({', '.join(pk_cols)}) NOT ENFORCED"
        )
        expected.append({"kind": "pk", "cname": cname, "cols": pk_cols})
    return ", ".join(rendered), expected


@settings(max_examples=200, deadline=None)
@given(schema_block())
def test_render_parse_roundtrip(block):
    text, expected = block
    parsed = _parse_schema_items(text)
    assert len(parsed) == len(expected)
    for got, want in zip(parsed, expected):
        assert got["kind"] == want["kind"], (got, want)
        if want["kind"] == "watermark":
            assert got["col"] == want["col"]
            assert got["expr"] == want["expr"]
            continue
        if want["kind"] == "pk":
            assert got["cname"] == want["cname"]
            assert got["cols"] == want["cols"]
            continue
        assert got["name"] == want["name"]
        # empty comments render as COMMENT '' and must parse as ''
        assert (got.get("comment") or None) == (want["comment"] or None) \
            or got.get("comment") == want["comment"]
        assert got.get("pos") == want["pos"], (text, got, want)
        if want["kind"] == "computed":
            assert got["expr"] == want["expr"]
        else:
            assert got["type"] == want["type"]
            if want["kind"] == "metadata":
                assert got["mdkey"] == want["mdkey"]
                assert bool(got["virtual"]) == want["virtual"]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(
    ["(", ")", "'", ",", " AS ", "WATERMARK", "PRIMARY KEY", "x", "INT"]),
    min_size=1, max_size=8))
def test_garbage_never_crashes_unhandled(parts):
    """Arbitrary token soup either parses or raises ValueError — no
    IndexError/AttributeError escapes the grammar."""
    try:
        _parse_schema_items(" ".join(parts))
    except ValueError:
        pass
