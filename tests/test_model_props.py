"""Model-based property surfaces, second batch (r12 evidence audit
sev-1): distributed operators whose semantics have a one-process model
to compare against — lookup joins (sync + async ordered), async calc
ordering, brute-force cosine top-k, and get_json_object path semantics
vs Python's own json module. Same discipline as test_properties.py
(the reference's randomized ITCase analog), derandomized for CI."""

from __future__ import annotations

import json
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

KEYS = ["a", "b", "c", "d", "missing1", "missing2"]
DIM = {"a": 1, "b": 2, "c": 3, "d": 4}  # the lookup "external system"


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(st.sampled_from(KEYS), min_size=1, max_size=20))
def test_lookup_join_matches_model(spark, rows):
    """lookup_join == per-row dict lookup, misses → NULL columns, row
    count preserved (left-join contract), whatever the batch split."""
    from flink_spark.operators.joins import lookup_join

    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(rows)], "rid long, k string"
    )

    def build_lookup(keys):
        return {k: {"dim_v": DIM[k]} for k in keys if k in DIM}

    got = {
        r.rid: r.dim_v
        for r in lookup_join(df, build_lookup, "k", "dim_v int").collect()
    }
    assert got == {i: DIM.get(k) for i, k in enumerate(rows)}


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(st.sampled_from(KEYS), min_size=1, max_size=16))
def test_async_lookup_join_matches_sync_model(spark, rows):
    """async_lookup_join (ordered mode) == the same dict model: per-key
    awaitables resolve in ARBITRARY order (keyed sleep), but emission
    must stay row-ordered and value-identical to the sync path."""
    import asyncio

    from flink_spark.operators.joins import async_lookup_join

    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(rows)], "rid long, k string"
    )

    async def lookup(key):
        # later-alphabet keys resolve FASTER: out-of-order completion
        await asyncio.sleep(0.001 * (6 - KEYS.index(key)))
        return {"dim_v": DIM[key]} if key in DIM else {}

    out = async_lookup_join(df, lookup, "k", "dim_v int").collect()
    got = {r.rid: r.dim_v for r in out}
    assert got == {i: DIM.get(k) for i, k in enumerate(rows)}


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=16))
def test_async_calc_matches_sync_map(spark, vals):
    """async_calc == the synchronous column computation: concurrent
    awaits with value-dependent delays must not reorder or drop rows
    (reference AsyncWaitOperator ORDERED mode)."""
    import asyncio

    from flink_spark.operators.asynccalc import async_calc

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "rid long, v long"
    )

    async def fn(row):
        await asyncio.sleep(0.0005 * (row["v"] % 7 + 1))
        return {"doubled": row["v"] * 2}

    out = async_calc(df, fn, "doubled long").collect()
    assert {(r.rid, r.doubled) for r in out} == {
        (i, v * 2) for i, v in enumerate(vals)
    }


_vec = st.lists(
    st.integers(-5, 5).map(float), min_size=4, max_size=4
).filter(lambda v: any(x != 0 for x in v))


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    qs=st.lists(_vec, min_size=1, max_size=3),
    cs=st.lists(_vec, min_size=1, max_size=8),
    k=st.integers(1, 4),
)
def test_brute_force_topk_matches_numpy(spark, qs, cs, k):
    """brute_force_topk == the numpy cosine model with the same
    (-score, cand_id) tie order."""
    from flink_spark.llm.similarity import brute_force_topk

    qdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(qs)],
        "query_id long, embedding array<double>",
    )
    cdf = spark.createDataFrame(
        [(j, v) for j, v in enumerate(cs)],
        "cand_id long, embedding array<double>",
    )
    got = {
        (r.query_id, r.rank): r.cand_id
        for r in brute_force_topk(qdf, cdf, k=k).collect()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    for qi, q in enumerate(qs):
        scored = sorted(
            ((-(round(cos(q, c), 12)), j) for j, c in enumerate(cs))
        )[:k]
        for rank, (_, j) in enumerate(scored, start=1):
            # ties on score make the winner id-ordered in BOTH paths
            assert got[(qi, rank)] == j, (qi, rank, got, scored)


_json_scalar = st.one_of(
    st.integers(-100, 100),
    st.sampled_from(["x", "yz", "", "a b"]),
    st.booleans(),
    st.none(),
)


def _json_obj(depth: int):
    if depth == 0:
        return _json_scalar
    sub = _json_obj(depth - 1)
    return st.one_of(
        _json_scalar,
        st.lists(sub, min_size=0, max_size=3),
        st.dictionaries(
            st.sampled_from(["k1", "k2", "k3"]), sub, max_size=3
        ),
    )


def _paths(doc, prefix="$"):
    yield prefix
    if isinstance(doc, dict):
        for k, v in doc.items():
            yield from _paths(v, f"{prefix}.{k}")
    elif isinstance(doc, list):
        for i, v in enumerate(doc):
            yield from _paths(v, f"{prefix}[{i}]")


def _model_get(doc, path):
    """Python model of get_json_object: walk the path, render scalars
    bare (strings unquoted), containers as compact JSON, MISSING paths
    as None. JSON null is rendered inconsistently by Spark (empirically
    mapped r12): an OBJECT-FIELD null returns SQL NULL, but a null at
    the ROOT or inside an ARRAY returns the literal string 'null' — the
    model mirrors that exactly."""
    import re as _re

    cur = doc
    last = "root"
    for tok in _re.findall(r"\.([A-Za-z_][\w]*)|\[(\d+)\]", path):
        key, idx = tok
        if key:
            if not isinstance(cur, dict) or key not in cur:
                return None
            cur = cur[key]
            last = "field"
        else:
            if not isinstance(cur, list) or int(idx) >= len(cur):
                return None
            cur = cur[int(idx)]
            last = "index"
    if cur is None:
        return None if last == "field" else "null"
    if isinstance(cur, bool):
        return "true" if cur else "false"
    if isinstance(cur, (dict, list)):
        return json.dumps(cur, separators=(",", ":"))
    return str(cur)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(doc=_json_obj(3))
def test_get_json_object_matches_python_json(spark, doc):
    """get_json_object over EVERY path of a generated document vs the
    Python-json model (scalars bare, containers compact, missing/null
    → NULL) — the JSON-family analog of the expression fuzz."""
    text = json.dumps(doc, separators=(",", ":"))
    paths = list(_paths(doc))[:12]
    df = spark.createDataFrame([(text,)], "j string")
    sel = [
        F.get_json_object("j", p).alias(f"c{i}")
        for i, p in enumerate(paths)
    ]
    row = df.select(*sel).collect()[0]
    for i, p in enumerate(paths):
        exp = _model_get(doc, p)
        assert row[f"c{i}"] == exp, (text, p, row[f"c{i}"], exp)
