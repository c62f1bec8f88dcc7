"""SQL:2016 JSON construction / fragment functions missing from Spark's
surface, expressed as pure JVM column expressions (reference
BuiltInFunctionDefinitions.java JSON_OBJECT / JSON_ARRAY / JSON_QUERY /
JSON_UNQUOTE / JSON_QUOTE; runtime
flink-table-runtime/.../functions/SqlJsonUtils.java).

Everything here is built from to_json / get_json_object / from_json /
filter — whole-stage-codegen'd, no Python in the row path. The ON NULL
clauses map exactly:

- JSON_OBJECT ... NULL ON NULL   → to_json(struct, ignoreNullFields=false)
- JSON_OBJECT ... ABSENT ON NULL → to_json(struct) (Spark's default drops
  null fields — the reference's ABSENT semantics)
- JSON_ARRAY ... ABSENT ON NULL  → filter(array, x -> x IS NOT NULL)
  before serializing (the reference DEFAULT for arrays)
- JSON_ARRAY ... NULL ON NULL    → serialize as-is (array nulls render
  as JSON null)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_object(absent_on_null: bool = False, **fields) -> Column:
    """JSON_OBJECT('k' VALUE v, ... [NULL|ABSENT] ON NULL) — reference
    default is NULL ON NULL (SqlJsonUtils.createObject)."""
    pairs = []
    for k, v in fields.items():
        pairs.append(F.lit(k))
        pairs.append(v if isinstance(v, Column) else F.lit(v))
    struct = F.named_struct(*pairs)
    opts = {} if absent_on_null else {"ignoreNullFields": "false"}
    return F.to_json(struct, opts)


def _json_scalar(c: Column) -> Column:
    """JSON text of one scalar value (number/string/bool/null), with full
    RFC 8259 escaping: serialize a one-element array, strip the
    brackets. Heterogeneous JSON_ARRAY elements each serialize
    independently, so Spark's array-type unification never bites."""
    arr = F.to_json(F.array(c))
    return arr.substr(F.lit(2), F.length(arr) - F.lit(2))


def json_array(*items, absent_on_null: bool = True) -> Column:
    """JSON_ARRAY(v1, v2, ... [ABSENT|NULL] ON NULL) — reference default
    is ABSENT ON NULL for arrays. Elements may be of MIXED types (JSON
    arrays are heterogeneous): each serializes separately to its JSON
    text and the texts assemble — all string ops, one codegen span."""
    texts = []
    for v in items:
        c = v if isinstance(v, Column) else F.lit(v)
        if absent_on_null:
            texts.append(F.when(c.isNotNull(), _json_scalar(c)))
        else:
            texts.append(_json_scalar(c))
    arr = F.array(*texts)
    if absent_on_null:
        arr = F.filter(arr, lambda x: x.isNotNull())
    return F.concat(F.lit("["), F.array_join(arr, ","), F.lit("]"))


def json_query(col, path: str) -> Column:
    """JSON_QUERY(j, path) WITHOUT ARRAY WRAPPER (the reference default):
    returns the matched object/array FRAGMENT as JSON text, NULL when the
    path misses or matches a scalar (JSON_VALUE's job). Spark's
    get_json_object already yields fragments; the scalar guard keeps the
    two functions' contracts disjoint, as SQL:2016 specifies."""
    frag = F.get_json_object(col, path)
    first = F.substring(F.ltrim(frag), 1, 1)
    return F.when(first.isin("[", "{"), frag)


def json_unquote(col) -> Column:
    """JSON_UNQUOTE (reference Flink 2.0 addition): if the value is a
    valid JSON string literal, remove the quotes and unescape; otherwise
    return the input unchanged. from_json with a STRING schema performs
    the exact JSON-string unescape; invalid literals fall through."""
    c = col if isinstance(col, Column) else F.col(col)
    quoted = c.startswith('"') & c.endswith('"') & (F.length(c) >= 2)
    # from_json needs a container schema: parse the literal inside a
    # one-element array (the inverse of _json_scalar's serialization)
    unescaped = F.from_json(
        F.concat(F.lit("["), c, F.lit("]")), "array<string>"
    )[0]
    return F.when(quoted, F.coalesce(unescaped, c)).otherwise(c)


def json_quote(col) -> Column:
    """JSON_QUOTE: wrap a string as a JSON string literal with RFC 8259
    escaping — serialize a one-element array (which escapes exactly) and
    strip the brackets; NULL stays NULL."""
    c = col if isinstance(col, Column) else F.col(col)
    arr = F.to_json(F.array(c))
    return F.when(
        c.isNotNull(), arr.substr(F.lit(2), F.length(arr) - F.lit(2))
    )


def json_string(col) -> Column:
    """JSON_STRING(value) (reference sql_functions.yml json family):
    serialize ANY value to its JSON text — numbers/booleans bare,
    strings quoted+escaped, arrays/structs/maps structurally; SQL NULL
    in → SQL NULL out (not the text 'null'). Type-generic, so it stays
    a Column helper rather than a typed SQL function; the serialization
    reuses the one-element-array trick (:func:`_json_scalar`), which is
    valid for nested values too."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.when(c.isNotNull(), _json_scalar(c))


def to_timestamp_ltz(col, precision: int = 3) -> Column:
    """TO_TIMESTAMP_LTZ(numeric, precision) (reference
    BuiltInFunctionDefinitions TO_TIMESTAMP_LTZ): epoch seconds
    (precision 0) or milliseconds (precision 3) → TIMESTAMP_LTZ.
    Spark's timestamp_seconds/timestamp_millis are the exact analogs."""
    c = col if isinstance(col, Column) else F.col(col)
    if precision == 0:
        return F.timestamp_seconds(c)
    if precision == 3:
        return F.timestamp_millis(c)
    raise ValueError("TO_TIMESTAMP_LTZ precision must be 0 or 3")
