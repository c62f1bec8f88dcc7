"""Structured-type value constructors (FLIP-520; reference
BuiltInFunctionDefinitions.java:1846 OBJECT_OF / OBJECT_UPDATE,
type strategies SpecificInputTypeStrategies.OBJECT_OF, inline format
StructuredType.java:112 ``STRUCTURED<'c', n0 t0, ...>``).

Spark-first mapping: a Flink structured type is a named struct whose
class identity lives in the TYPE SYSTEM only (RowData stores just the
fields — reference StructuredType docs). Spark's named_struct is the
value-identical runtime shape, so:

- ``OBJECT_OF('com.example.User', 'name', 'Bob', 'age', 42)`` →
  ``named_struct('name', 'Bob', 'age', 42)`` — pure JVM expression; the
  class-name literal is validated (Java-identifier dotted path) and then
  carried only as documentation, exactly as much runtime meaning as the
  reference gives it.
- ``OBJECT_UPDATE(obj, 'name', 'Alice')`` → ``Column.withField`` per
  pair (JVM StructsToStruct codegen, no shuffle, no Python).

SQL surface: ``OBJECT_OF`` rewrites textually (schema-free);
``OBJECT_UPDATE`` rewrites when its target is an inline ``OBJECT_OF``
call (the constructor+update idiom) — updating an arbitrary column
expression needs the column's resolved struct schema, which SQL-string
rewriting doesn't see, so that form is DataFrame-only (``object_update``
below), documented as the honest boundary.

Validations mirror the reference's input-type strategy: the class name
and every field name must be STRING LITERALS, field names must be
distinct, and the argument list must pair up.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_CLASS_RE = re.compile(r"^[A-Za-z_$][\w$]*(\.[A-Za-z_$][\w$]*)*$")
_STR_LIT = re.compile(r"^'([^']*)'$")


def object_of(class_name: str, *pairs) -> Column:
    """DataFrame-side OBJECT_OF: alternating field-name / value pairs →
    named struct. Values may be Columns or Python literals."""
    _validate_class(class_name)
    if len(pairs) % 2:
        raise ValueError("OBJECT_OF: field arguments must be name/value pairs")
    names = _pair_names(pairs[0::2])
    cols = []
    for name, val in zip(names, pairs[1::2]):
        cols.append(F.lit(name))
        cols.append(val if isinstance(val, Column) else F.lit(val))
    return F.named_struct(*cols)


def object_update(obj: Column, *pairs) -> Column:
    """DataFrame-side OBJECT_UPDATE: replace existing fields of a struct
    column (Column.withField — JVM, adds-or-replaces; the reference
    errors on unknown fields, which needs the resolved schema: callers
    going through the SQL layer get that check from Spark's analyzer when
    the result is consumed with a fixed schema)."""
    if not pairs or len(pairs) % 2:
        raise ValueError(
            "OBJECT_UPDATE requires an object plus name/value pairs"
        )
    names = _pair_names(pairs[0::2])
    out = obj
    for name, val in zip(names, pairs[1::2]):
        out = out.withField(
            name, val if isinstance(val, Column) else F.lit(val)
        )
    return out


def _validate_class(class_name) -> None:
    if not isinstance(class_name, str) or not _CLASS_RE.match(class_name):
        raise ValueError(
            f"OBJECT_OF: class name must be a dotted Java identifier "
            f"string literal, got {class_name!r}"
        )


def _pair_names(names) -> list[str]:
    out = []
    for n in names:
        if not isinstance(n, str):
            raise ValueError(
                f"OBJECT_OF/OBJECT_UPDATE: field names must be string "
                f"literals, got {n!r}"
            )
        out.append(n)
    if len(out) != len(set(out)):
        raise ValueError("field names must be distinct")
    return out


# ---------------------------------------------------------- SQL rewrite ----

_OBJ_FN_RE = re.compile(r"\bOBJECT_(OF|UPDATE)\s*\(", re.IGNORECASE)


def rewrite_object_functions(stmt: str) -> str:
    """Rewrite OBJECT_OF(...) (and OBJECT_UPDATE over an inline
    OBJECT_OF) in a SQL string onto named_struct. Repeated until no call
    remains; nested calls resolve innermost-first."""
    while True:
        m = _OBJ_FN_RE.search(stmt)
        if m is None:
            return stmt
        start, open_paren = m.start(), m.end() - 1
        args_text, end = _balanced(stmt, open_paren)
        args = [a.strip() for a in _split_args(args_text)]
        kind = m.group(1).upper()
        if kind == "OF":
            repl = _rewrite_of(args)
        else:
            repl = _rewrite_update(args)
        stmt = stmt[:start] + repl + stmt[end:]


def _rewrite_of(args: list[str]) -> str:
    if not args:
        raise ValueError("OBJECT_OF requires a class-name argument")
    cm = _STR_LIT.match(args[0])
    if cm is None:
        raise ValueError(
            "OBJECT_OF: the class name must be a string literal"
        )
    _validate_class(cm.group(1))
    kvs = args[1:]
    if len(kvs) % 2:
        raise ValueError(
            "OBJECT_OF: field arguments must be name/value pairs"
        )
    names = []
    for k in kvs[0::2]:
        km = _STR_LIT.match(k)
        if km is None:
            raise ValueError(
                f"OBJECT_OF: field names must be string literals, got {k}"
            )
        names.append(km.group(1))
    if len(names) != len(set(names)):
        raise ValueError("OBJECT_OF: field names must be distinct")
    return "named_struct(" + ", ".join(kvs) + ")" if kvs else "named_struct()"


def _rewrite_update(args: list[str]) -> str:
    if len(args) < 3 or (len(args) - 1) % 2:
        raise ValueError(
            "OBJECT_UPDATE requires an object plus name/value pairs"
        )
    # the search loop finds the OUTERMOST call first — resolve an inline
    # OBJECT_OF target before pattern-matching it
    target = rewrite_object_functions(args[0])
    tm = re.match(r"^named_struct\s*\((?P<body>.*)\)$", target,
                  re.IGNORECASE | re.DOTALL)
    if tm is None:
        raise ValueError(
            "OBJECT_UPDATE over an arbitrary column expression needs the "
            "resolved struct schema — use the DataFrame function "
            "flink_spark.functions.objects.object_update, or construct "
            "the object inline with OBJECT_OF"
        )
    base = [a.strip() for a in _split_args(tm.group("body"))]
    fields = {}
    order = []
    for k, v in zip(base[0::2], base[1::2]):
        fields[k] = v
        order.append(k)
    for k, v in zip(args[1::2], args[2::2]):
        km = _STR_LIT.match(k)
        if km is None:
            raise ValueError(
                f"OBJECT_UPDATE: field names must be string literals, got {k}"
            )
        if k not in fields:
            raise ValueError(
                f"OBJECT_UPDATE: field {km.group(1)!r} does not exist in "
                "the object"
            )
        fields[k] = v
    parts = []
    for k in order:
        parts.append(k)
        parts.append(fields[k])
    return "named_struct(" + ", ".join(parts) + ")"


def _balanced(s: str, open_idx: int) -> tuple[str, int]:
    """Return (inner_text, index_after_close) for the paren at open_idx,
    respecting nesting and single-quoted literals."""
    depth, q = 0, None
    for j in range(open_idx, len(s)):
        ch = s[j]
        if q:
            if ch == q:
                q = None
            continue
        if ch == "'":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return s[open_idx + 1:j], j + 1
    raise ValueError("unbalanced parentheses in OBJECT_* call")


def _split_args(s: str) -> list[str]:
    out, depth, cur, q = [], 0, [], None
    for ch in s:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            continue
        if ch == "'":
            q = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur and "".join(cur).strip():
        out.append("".join(cur))
    return out
