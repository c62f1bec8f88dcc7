"""Property/fuzz tests for the SQL-rewrite dialect layer (catalog.py +
sqltok.py) — the statement rewrites are regex-over-masked-text
transforms, and every external review round has found its bugs in their
edge geometry (literals that look like structure, prologues, residues,
nesting). These properties pin the whole invariant class down:

  - literal spans survive every rewrite byte-for-byte;
  - rewrites reach a fixpoint (re-running is the identity);
  - paren balance is preserved;
  - prologues (INSERT / WITH) are kept exactly once;
  - the rewritten SQL actually executes on Spark and matches a
    directly-computed model of the reference semantics.

Derandomized so the suite is deterministic in CI."""

from __future__ import annotations

import re
from collections import Counter

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from flink_spark.sqltok import (
    mask_literals,
    match_paren,
    split_top_commas,
)

# --- generators -------------------------------------------------------------

#: literal payloads that LOOK like rewrite triggers — none of them may
#: ever be touched by a rewrite
HOSTILE_PAYLOADS = [
    "CAST(x AS CHAR(3))",
    "RAND_INTEGER(1, 2)",
    "GROUP_ID()",
    "it''s fine",
    ") , ((",
    "-- not a comment",
    "/*+ BROADCAST(t) */",
    "GROUP BY GROUPING SETS ((a),(a))",
    "AS VARCHAR(7)",
    "",
]

_lit = st.sampled_from(HOSTILE_PAYLOADS).map(lambda p: f"'{p}'")
_atom = st.one_of(_lit, st.sampled_from(["c1", "42", "NULL"]))


def _exprs(depth: int = 2):
    if depth == 0:
        return _atom
    sub = _exprs(depth - 1)
    return st.one_of(
        _atom,
        st.tuples(sub, sub).map(lambda t: f"CONCAT({t[0]}, {t[1]})"),
        sub.map(lambda e: f"({e})"),
        sub.map(lambda e: f"UPPER({e})"),
        sub.map(lambda e: f"CAST({e} AS STRING)"),
    )


def _balance(sql: str) -> int:
    m = mask_literals(sql)
    return m.count("(") - m.count(")")


def _lit_counts(sql: str) -> dict:
    return {
        f"'{p}'": sql.count(f"'{p}'") for p in HOSTILE_PAYLOADS if p
    }


@pytest.fixture(scope="module")
def dialect_env(spark):
    from flink_spark.catalog import TableEnvironment

    return TableEnvironment(spark)


# --- sqltok primitives ------------------------------------------------------

_text = st.text(
    alphabet="ab'\"`()-,/*\\\n x",
    max_size=60,
)


@given(_text)
@settings(max_examples=300, deadline=None, derandomize=True)
def test_mask_literals_same_length_and_idempotent(s):
    m = mask_literals(s)
    assert len(m) == len(s)
    # masking an already-masked text changes nothing: interiors are
    # blank, delimiters survive
    assert mask_literals(m) == m


@given(st.lists(_exprs(1), min_size=1, max_size=4))
@settings(max_examples=120, deadline=None, derandomize=True)
def test_split_top_commas_constructive(parts):
    joined = ", ".join(parts)
    assert split_top_commas(joined) == [p.strip() for p in parts]


@given(_exprs(2), _text)
@settings(max_examples=120, deadline=None, derandomize=True)
def test_match_paren_finds_closer(inner, suffix):
    s = "(" + inner + ")" + suffix
    m = mask_literals(s)
    j = match_paren(m, 1)
    assert j == len(inner) + 2
    assert _balance(s[:j]) == 0


# --- precision casts --------------------------------------------------------


@given(
    _exprs(2),
    st.sampled_from(["CHAR", "VARCHAR", "TIMESTAMP", "TIMESTAMP_LTZ"]),
    st.integers(min_value=0, max_value=9),
)
@settings(max_examples=150, deadline=None, derandomize=True)
def test_precision_cast_rewrite_structure(dialect_env, expr, ty, n):
    if ty in ("CHAR", "VARCHAR") and n == 0:
        n = 1
    stmt = f"SELECT CAST({expr} AS {ty}({n})) AS c, {expr} AS d FROM t"
    out = dialect_env._rewrite_precision_casts(stmt)
    # fixpoint
    assert dialect_env._rewrite_precision_casts(out) == out
    # paren balance preserved
    assert _balance(out) == _balance(stmt) == 0
    # hostile literals preserved byte-for-byte (counts may GROW — the
    # TIMESTAMP(n) truncation legitimately references its operand twice —
    # but no literal may be corrupted or lost)
    assert all(
        _lit_counts(out)[k] >= v for k, v in _lit_counts(stmt).items()
    )
    # no precision-cast tail survives outside literals
    assert not re.search(
        r"AS\s+(CHAR|VARCHAR|TIMESTAMP|TIMESTAMP_LTZ)\s*\(\s*\d+\s*\)",
        mask_literals(out),
        re.IGNORECASE,
    )


@given(
    st.text(alphabet="ab x", max_size=12),
    st.integers(min_value=1, max_value=8),
    st.sampled_from(["CHAR", "VARCHAR"]),
)
@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_precision_cast_char_model(dialect_env, payload, n, ty):
    """CAST('<s>' AS CHAR(n)) pads/truncates to n; VARCHAR(n) truncates
    (reference CastRulesProvider CHAR/VARCHAR trim-pad semantics) — the
    rewritten SQL must execute and match the model."""
    got = dialect_env.sql_query(
        f"SELECT CAST('{payload}' AS {ty}({n})) AS c"
    ).collect()[0].c
    if ty == "CHAR":
        exp = payload[:n] if len(payload) > n else payload.ljust(n)
    else:
        exp = payload[:n]
    assert got == exp, (payload, n, ty, got, exp)


@given(
    st.integers(min_value=0, max_value=999_999),
    st.integers(min_value=0, max_value=6),
    st.sampled_from(["UTC", "Asia/Kathmandu", "America/New_York"]),
)
@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_precision_cast_ntz_truncation_tz_independent(
    spark, dialect_env, micros, n, tz
):
    """TIMESTAMP(n) truncation of an NTZ value is a wall-clock operation
    — the result must not depend on the session timezone (the fraction
    is derived via EXTRACT(SECOND), not epoch micros)."""
    frac = f"{micros:06d}"
    lit = f"2024-03-05 10:11:12.{frac}"
    saved = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        got = dialect_env.sql_query(
            f"SELECT CAST(TIMESTAMP '{lit}' AS TIMESTAMP({n})) AS c"
        ).collect()[0].c
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
    keep = micros - micros % (10 ** (6 - n))
    assert got.microsecond == keep, (lit, n, tz, got)
    assert got.second == 12


# --- RAND_INTEGER -----------------------------------------------------------


@given(_exprs(1), st.integers(min_value=1, max_value=99))
@settings(max_examples=100, deadline=None, derandomize=True)
def test_rand_integer_rewrite_structure(dialect_env, seed_expr, bound):
    stmt = (
        f"SELECT RAND_INTEGER(7, RAND_INTEGER(3, {bound}) + 1) AS r, "
        f"{seed_expr} AS d FROM t"
    )
    out = dialect_env._rewrite_rand_integer(stmt)
    assert dialect_env._rewrite_rand_integer(out) == out
    assert _balance(out) == _balance(stmt) == 0
    assert _lit_counts(out) == _lit_counts(stmt)
    # no 2-arg RAND_INTEGER survives outside literals
    for m in re.finditer(r"\bRAND_INTEGER\s*\(", mask_literals(out),
                         re.IGNORECASE):
        j = match_paren(mask_literals(out), m.end())
        assert j > 0
        assert len(split_top_commas(out[m.end(): j - 1])) == 1


def test_rand_integer_nested_executes(dialect_env):
    rows = dialect_env.sql_query(
        "SELECT RAND_INTEGER(7, RAND_INTEGER(3, 50) + 1) AS r "
        "FROM VALUES (1), (2), (3) AS t(x)"
    ).collect()
    assert all(0 <= r.r <= 50 for r in rows)


# --- GROUP_ID decomposition -------------------------------------------------

_SETS_POOL = ["(a)", "(b)", "(a, b)", "()"]


def _expected_group_id(data, sets):
    """The reference decomposition (DecomposeGroupingSetsRule): round j
    aggregates the distinct sets whose multiplicity exceeds j with
    GROUP_ID() = j."""
    canon = [" ".join(s.replace("(", " ").replace(")", " ").split())
             for s in sets]
    mult = Counter(canon)
    order = list(dict.fromkeys(canon))
    out = []
    for j in range(max(mult.values())):
        for key in order:
            if mult[key] <= j:
                continue
            cols = [c.strip() for c in key.split(",") if c.strip()]
            groups = {}
            for a, b, v in data:
                gk = tuple((a if "a" in cols else None,
                            b if "b" in cols else None))
                groups[gk] = groups.get(gk, 0) + 1
            for (ga, gb), nrows in groups.items():
                out.append((ga, gb, nrows, j))
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


@given(
    st.lists(st.sampled_from(_SETS_POOL), min_size=1, max_size=5),
    st.booleans(),
)
@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_group_id_duplicate_sets_model(spark, dialect_env, sets, use_with):
    """Duplicate grouping sets with GROUP_ID() — executed end to end
    through the dialect layer and compared against the decomposition
    model, with and without a WITH prologue."""
    sets = sets + ["(a, b)"]  # keep every selected column groupable
    data = [("x", "p", 1), ("x", "q", 2), ("y", "p", 3), ("y", "p", 4)]
    spark.createDataFrame(data, "a string, b string, v int") \
        .createOrReplaceTempView("gid_src")
    body = (
        "SELECT a, b, COUNT(*) AS n, GROUP_ID() AS gid FROM gid_src "
        f"GROUP BY GROUPING SETS ({', '.join(sets)})"
    )
    stmt = (
        "WITH gw AS (SELECT * FROM gid_src) "
        + body.replace("FROM gid_src", "FROM gw")
        if use_with else body
    )
    got = sorted(
        (tuple(r) for r in dialect_env.sql_query(stmt).collect()),
        key=lambda r: tuple(str(x) for x in r),
    )
    assert [tuple(r) for r in got] == _expected_group_id(data, sets)


@given(st.lists(st.sampled_from(_SETS_POOL), min_size=2, max_size=4))
@settings(max_examples=40, deadline=None, derandomize=True)
def test_group_id_insert_prologue_structure(dialect_env, sets):
    """INSERT (with or without a WITH prologue) stays OUTSIDE the
    decomposition: exactly one INSERT head, no GROUP_ID residue."""
    sets = sets + [sets[0]]  # force a duplicate → real decomposition
    for prologue in (
        "INSERT INTO tgt ",
        "INSERT INTO tgt WITH cte AS (SELECT * FROM src) ",
    ):
        src = "cte" if "cte" in prologue else "src"
        stmt = (
            prologue
            + f"SELECT a, GROUP_ID() AS gid FROM {src} "
            + f"GROUP BY GROUPING SETS ({', '.join(sets)})"
        )
        out = dialect_env._rewrite_group_id(stmt)
        masked = mask_literals(out)
        assert not re.search(r"\bGROUP_ID\s*\(", masked, re.IGNORECASE)
        assert _balance(out) == 0
        heads = re.findall(r"\bINSERT\s+INTO\b", masked, re.IGNORECASE)
        assert len(heads) == 1, out
        assert re.match(r"\s*INSERT\s+INTO\s+tgt\b", out, re.IGNORECASE)
        # every duplicate round is present: UNION ALL count = rounds - 1
        canon = Counter(
            " ".join(s.replace("(", " ").replace(")", " ").split())
            for s in sets
        )
        n_union = len(re.findall(r"\bUNION\s+ALL\b", masked, re.IGNORECASE))
        assert n_union >= max(canon.values()) - 1


# --- STATE_TTL duration labels ----------------------------------------------

_TTL_LABELS_OK = (
    "ns nano nanos nanosecond nanoseconds us µs micro micros microsecond "
    "microseconds ms milli millis millisecond milliseconds s sec secs "
    "second seconds min minute minutes m h hour hours d day days"
).split()
_TTL_LABELS_BAD = ["fortnight", "mss", "x", "secondss", "minz", "hrs"]


@pytest.mark.parametrize("label", _TTL_LABELS_OK)
def test_state_ttl_accepts_reference_labels(dialect_env, label):
    """Every label of the reference TimeUtils.parseDuration plural table
    validates — including bare 'm' minutes (TimeUtils.java MINUTES
    singular) and spaced forms."""
    assert dialect_env._fix_hint_block(
        f"STATE_TTL('t1'='30 {label}')"
    ) == ""
    assert dialect_env._fix_hint_block(
        f"STATE_TTL('t1'='30{label}')"
    ) == ""


@pytest.mark.parametrize("label", _TTL_LABELS_BAD)
def test_state_ttl_rejects_unknown_labels(dialect_env, label):
    with pytest.raises(ValueError, match="STATE_TTL"):
        dialect_env._fix_hint_block(f"STATE_TTL('t1'='30 {label}')")


# --- full-router literal passthrough ------------------------------------

_ROUTER_MARKERS = [
    "TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL ''1'' HOUR)",
    "MATCH_RECOGNIZE (PARTITION BY x)",
    "ML_PREDICT(MODEL m, DESCRIPTOR(x))",
    "FROM_CHANGELOG(input => TABLE x)",
    "GROUP BY GROUPING SETS ((a),(a))",
    "RAND_INTEGER(1, 2)",
    "CAST(x AS CHAR(3))",
    "(a, b) OVERLAPS (c, d)",
    "/*+ STATE_TTL(''t''=''1d'') */",
    "INSERT INTO tgt SELECT 1",
    "SET ''k''=''v''",
    "USE MODULE hive",
    "SHOW CREATE TABLE t",
    "WATERMARK FOR ts AS ts - INTERVAL ''5'' SECOND(3)",
]


@pytest.mark.parametrize("marker", _ROUTER_MARKERS)
def test_router_keywords_inside_literals_pass_through(dialect_env, marker):
    """A dialect marker quoted inside a string literal is DATA: the full
    execute_sql router must neither reroute the statement nor rewrite
    the literal — the value comes back byte-for-byte."""
    rows = dialect_env.sql_query(
        f"SELECT '{marker}' AS s FROM VALUES (1) AS t(x)"
    ).collect()
    expected = marker.replace("''", "'")
    assert rows[0].s == expected


def test_sql_query_rejects_statements_without_executing(
    spark, dialect_env, monkeypatch
):
    """sql_query must reject non-queries BEFORE executing them — a
    validate-after-execute would let sql_query('INSERT ...') mutate
    state and then raise (code-review r9 finding; reference sqlQuery
    rejects at parse time). Proven with a spy: execute_sql must never
    be reached for a rejected statement."""
    calls = []
    real = dialect_env.execute_sql
    monkeypatch.setattr(
        dialect_env, "execute_sql",
        lambda sql: (calls.append(sql), real(sql))[1],
    )
    for stmt in (
        "INSERT INTO t SELECT 1",
        "DROP TABLE t",
        "CREATE TABLE t (x INT) WITH ('connector'='values')",
        "SET 'k'='v'",
        "  insert overwrite t SELECT 1",
    ):
        with pytest.raises(ValueError, match="sql_query expects a query"):
            dialect_env.sql_query(stmt)
    assert calls == [], "execute_sql ran for a rejected statement"
    # a marker spelled inside a literal must NOT trigger the rejection
    assert dialect_env.sql_query(
        "SELECT 'INSERT INTO t' AS s").collect()[0].s == "INSERT INTO t"
    # queries in every accepted spelling still route
    assert dialect_env.sql_query("VALUES (1), (2)").count() == 2
    assert dialect_env.sql_query(
        "WITH c AS (SELECT 1 AS a) SELECT * FROM c").count() == 1
    assert dialect_env.sql_query(
        "(SELECT 1 AS a) UNION ALL (SELECT 2)").count() == 2
    assert len(calls) == 4


# --- OVERLAPS ---------------------------------------------------------------


@given(
    st.sampled_from([
        ("ts1", "INTERVAL '1' HOUR"),
        ("ts1", "ts2"),
        ("TIMESTAMP '2024-01-01 10:00:00'", "INTERVAL '30' MINUTE"),
        ("COALESCE(ts1, ts2)", "ts2"),
    ]),
    st.sampled_from([
        ("ts2", "INTERVAL '2' HOUR"),
        ("ts2", "ts1"),
    ]),
    _lit,
)
@settings(max_examples=40, deadline=None, derandomize=True)
def test_overlaps_rewrite_structure(dialect_env, left, right, lit):
    stmt = (
        f"SELECT ({left[0]}, {left[1]}) OVERLAPS ({right[0]}, {right[1]})"
        f" AS o, {lit} AS d FROM t"
    )
    out = dialect_env._rewrite_overlaps(stmt)
    # no OVERLAPS survives outside literals; balanced; fixpoint; the
    # hostile literal is untouched
    assert not re.search(r"\bOVERLAPS\b", mask_literals(out), re.IGNORECASE)
    assert _balance(out) == 0
    assert dialect_env._rewrite_overlaps(out) == out
    assert all(
        _lit_counts(out)[k] >= v for k, v in _lit_counts(stmt).items()
    )


def test_overlaps_executes_and_matches_model(dialect_env):
    """Executable check of the normalized inclusive-bounds semantics:
    reversed endpoints still overlap correctly, bound-touching counts
    as overlap (reference TemporalOverlapsConverter)."""
    rows = dialect_env.sql_query("""
      SELECT
        (TIMESTAMP '2024-01-01 10:00:00', INTERVAL '1' HOUR) OVERLAPS
          (TIMESTAMP '2024-01-01 10:30:00', INTERVAL '1' HOUR) AS a,
        (TIMESTAMP '2024-01-01 12:00:00', TIMESTAMP '2024-01-01 11:00:00')
          OVERLAPS
          (TIMESTAMP '2024-01-01 11:30:00', TIMESTAMP '2024-01-01 13:00:00')
          AS b,
        (TIMESTAMP '2024-01-01 10:00:00', INTERVAL '1' HOUR) OVERLAPS
          (TIMESTAMP '2024-01-01 11:00:00', INTERVAL '1' HOUR) AS c,
        (TIMESTAMP '2024-01-01 10:00:00', INTERVAL '1' HOUR) OVERLAPS
          (TIMESTAMP '2024-01-01 11:00:01', INTERVAL '1' HOUR) AS d
    """).collect()[0]
    assert rows.a is True        # plain overlap
    assert rows.b is True        # reversed endpoints normalized
    assert rows.c is True        # touching bounds are INCLUSIVE
    assert rows.d is False       # disjoint


def test_sql_query_rejects_with_prefixed_dml(dialect_env, monkeypatch):
    """A WITH prologue can legally prefix DML in Spark's grammar — the
    query gate must reject it at depth 0 without executing (code-review
    r9 second pass)."""
    calls = []
    monkeypatch.setattr(
        dialect_env, "execute_sql",
        lambda sql: calls.append(sql),
    )
    for stmt in (
        "WITH c AS (SELECT 1 AS a) INSERT INTO tgt SELECT * FROM c",
        "WITH c AS (SELECT 1 AS a) DELETE FROM tgt",
        "WITH c AS (SELECT 1 AS a) MERGE INTO tgt USING c ON true "
        "WHEN MATCHED THEN DELETE",
    ):
        with pytest.raises(ValueError, match="sql_query expects a query"):
            dialect_env.sql_query(stmt)
    assert calls == []
    # DML verbs inside subqueries/identifiers/literals must NOT trip it
    monkeypatch.undo()
    assert dialect_env.sql_query(
        "SELECT 'INSERT INTO x' AS s, 1 AS delete_flag "
        "FROM VALUES (1) AS updates(x)"
    ).count() == 1


def test_sql_query_accepts_bare_dml_named_identifiers(dialect_env):
    """ADVICE r9: insert/update/delete/merge are NOT reserved in Spark's
    grammar, so a depth-0 identifier spelled like a DML verb is a legal
    query token — the gate must only inspect the statement-body verb
    position (after a WITH prologue), never arbitrary depth-0 tokens."""
    assert dialect_env.sql_query("SELECT 1 AS merge").collect()[0].merge == 1
    assert dialect_env.sql_query(
        "SELECT x AS insert, x + 1 AS update FROM VALUES (1) AS t(x) "
        "ORDER BY insert"
    ).count() == 1
    # the same bare identifiers after a WITH prologue (depth 0, but in
    # expression position — the body verb is SELECT)
    assert dialect_env.sql_query(
        "WITH c (delete) AS (SELECT 2) SELECT delete AS merge, 1 AS "
        "insert FROM c"
    ).collect()[0].merge == 2
    # multi-CTE prologue with a column-alias list still finds the body
    assert dialect_env.sql_query(
        "WITH a AS (SELECT 1 AS x), b (update) AS (SELECT 2) "
        "SELECT a.x, b.update FROM a, b"
    ).count() == 1
    # backtick-quoted CTE name + a bare DML-named identifier: the
    # prologue parser must handle the quoted name rather than falling
    # back to the conservative scan (which would wrongly reject `merge`)
    assert dialect_env.sql_query(
        "WITH `c` AS (SELECT 1 AS x) SELECT x AS merge FROM `c`"
    ).collect()[0].merge == 1


def test_sql_query_with_gate_hostile_prologues(dialect_env, monkeypatch):
    """The narrowed WITH gate must not be bypassable: DML bodies behind
    RECURSIVE keywords, column-alias lists, multi-CTE chains, and
    comment/literal camouflage are all still rejected before execution;
    an unparseable prologue falls back to the conservative scan."""
    calls = []
    monkeypatch.setattr(
        dialect_env, "execute_sql", lambda sql: calls.append(sql),
    )
    for stmt in (
        "WITH c (a) AS (SELECT 1) INSERT INTO tgt SELECT * FROM c",
        "WITH a AS (SELECT 1), b AS (SELECT 2) UPDATE tgt SET x = 1",
        "WITH /* body: */ c AS (SELECT 1 AS a) DELETE FROM tgt",
        "WITH c AS (SELECT ') INSERT' AS s) MERGE INTO tgt USING c "
        "ON true WHEN MATCHED THEN DELETE",
        # unparseable prologue (missing AS) + depth-0 DML: the
        # conservative fallback must still reject
        "WITH c (SELECT 1) INSERT INTO tgt VALUES (1)",
    ):
        with pytest.raises(ValueError, match="sql_query expects a query"):
            dialect_env.sql_query(stmt)
    assert calls == []


# --- non-conjunctive NOT IN rewrite (r10 disjunctive, r11 all
# --- non-conjunctive positions) ------------------------------------------------


def test_not_in_rewrite_scope():
    """catalog._rewrite_nonconjunctive_not_in: a single-column
    identifier-probe NOT IN <subquery> is rewritten in every position
    upstream miscompiles (disjunctive clause, projection, IS-NULL test,
    negation, function argument, THEN/ELSE result); a pure conjunct
    under WHERE/HAVING/ON/WHEN passes through byte-identical (Spark's
    null-aware anti join is correct AND fast there), as do literal
    lists, tuple probes, and parse-hazardous bare operator adjacency."""
    from flink_spark.catalog import _rewrite_nonconjunctive_not_in as rw

    untouched = [
        # conjunctive
        "SELECT i FROM r WHERE i NOT IN (SELECT v FROM w) AND j > 0",
        "SELECT i FROM r WHERE i NOT IN (SELECT v FROM w)",
        # literal IN-list (expression path is already standard)
        "SELECT i FROM r WHERE i NOT IN (1, 2, NULL) OR j = 3",
        # tuple probe in a CONJUNCTIVE filter: upstream plans the
        # row-value null-aware anti join correctly — byte-identical
        "SELECT i FROM r WHERE (i, j) NOT IN (SELECT v, u FROM w)",
        # computed-expression tuple components: out of scope (r12 —
        # only plain qualified identifiers are accepted)
        "SELECT i, (i + 1, j) NOT IN (SELECT v, u FROM w) AS f FROM r",
        # function-call argument list is NOT a tuple probe
        "SELECT f(i, j) NOT IN (SELECT v FROM w) FROM r",
        # OR exists only DEEPER than the predicate's level
        "SELECT i FROM r WHERE i NOT IN (SELECT v FROM w WHERE a OR b)",
        # NOT IN inside a string literal
        "SELECT 'x NOT IN (SELECT v FROM w) OR y' AS s FROM r",
        # ADVICE r10: an OR in an UNRELATED clause (the SELECT list)
        # must not demote a conjunctive WHERE predicate to the
        # 3x-scan composite
        "SELECT p OR q FROM t WHERE x NOT IN (SELECT a FROM s)",
        "SELECT p OR q AS c FROM t WHERE x NOT IN (SELECT a FROM s) "
        "AND y = 1",
        # WHEN condition, no OR: FALSE and UNKNOWN take the same branch
        "SELECT CASE WHEN i NOT IN (SELECT v FROM w) THEN 1 ELSE 2 END "
        "FROM r",
        # bare comparison adjacency: `a = i NOT IN (q)` parses as
        # `(a = i) NOT IN (q)` — a textual replacement would re-group
        "SELECT i FROM r WHERE a = i NOT IN (SELECT v FROM w) OR j = 3",
        # HAVING conjunct
        "SELECT g FROM r GROUP BY g HAVING g NOT IN (SELECT v FROM w)",
        # trailing clauses after the predicate bound the clause scan
        "SELECT i FROM r WHERE i NOT IN (SELECT v FROM w) ORDER BY i",
        # double negation in a FILTER: NNF resolves to IN, which is
        # outcome-safe under a filter — upstream plans it correctly
        # (pinned empirically in test_differential_fuzz)
        "SELECT i FROM r WHERE NOT (i NOT IN (SELECT v FROM w))",
        "SELECT i FROM r WHERE NOT i NOT IN (SELECT v FROM w)",
        # plain IN is outcome-safe in positive filter contexts
        "SELECT i FROM r WHERE j = 3 OR i IN (SELECT v FROM w)",
        "SELECT i FROM r WHERE i IN (SELECT v FROM w)",
        # NOT over an OR-group: NNF turns it into a conjunction of
        # effective NOT INs — upstream plans that null-aware (pinned)
        "SELECT i FROM r WHERE NOT (j = 3 OR i IN (SELECT v FROM w))",
    ]
    for stmt in untouched:
        assert rw(stmt) == stmt, stmt

    rewritten = [
        # disjunctive (r10)
        "SELECT i FROM r WHERE j = 3 OR i NOT IN (SELECT v FROM w)",
        "SELECT i FROM r WHERE i NOT IN (SELECT v FROM w) OR j = 3",
        "SELECT i FROM r WHERE a = 1 AND (j = 3 OR i NOT IN "
        "(SELECT v FROM w))",
        "SELECT i FROM r WHERE r.i NOT IN (WITH c AS (SELECT v FROM w) "
        "SELECT v FROM c) OR j = 3",
        # value positions (r11) — both operators deviate there upstream
        "SELECT i, i NOT IN (SELECT v FROM w) AS f FROM r",
        "SELECT i NOT IN (SELECT v FROM w) FROM r",
        "SELECT i, i IN (SELECT v FROM w) AS f FROM r",
        "SELECT i, (i NOT IN (SELECT v FROM w)) IS NULL AS f FROM r",
        "SELECT i, (i IN (SELECT v FROM w)) IS NULL AS f FROM r",
        "SELECT i, NOT (i IN (SELECT v FROM w)) AS f FROM r",
        "SELECT CASE WHEN a THEN i NOT IN (SELECT v FROM w) "
        "ELSE FALSE END FROM r",
        "SELECT coalesce(i NOT IN (SELECT v FROM w), FALSE) FROM r",
        "SELECT CASE WHEN i NOT IN (SELECT v FROM w) OR a THEN 1 "
        "ELSE 2 END FROM r",
        "SELECT (SELECT i NOT IN (SELECT v FROM w)) FROM r",
        # effectively-negated IN under OR: one arm of the
        # complementary-dedup deviance (`P OR NOT P` collapses to a
        # two-valued existence variable upstream)
        "SELECT i FROM r WHERE i IN (SELECT v FROM w) "
        "OR NOT (i IN (SELECT v FROM w))",
        # NOT over an AND-group: NNF-disjunctive (De Morgan) — the
        # shape that re-exposed the complementary dedup via
        # NOT (P AND NOT P) (boolean-tree fuzz find, r11)
        "SELECT i FROM r WHERE NOT (j = 3 AND i IN (SELECT v FROM w))",
        "SELECT i FROM r WHERE NOT (i IN (SELECT v FROM w) "
        "AND i NOT IN (SELECT v FROM w))",
        # tuple probes (r12): same position taxonomy as single-column
        "SELECT i, (i, j) NOT IN (SELECT v, u FROM w) AS f FROM r",
        "SELECT i, (r.i, r.j) IN (SELECT v, u FROM w) AS f FROM r",
        "SELECT i FROM r WHERE j = 3 OR (i, j) NOT IN "
        "(SELECT v, u FROM w)",
        "SELECT i, ((i, j) NOT IN (SELECT v, u FROM w)) IS NULL "
        "AS f FROM r",
        "SELECT i, (a.`b`, c.d, e) NOT IN (SELECT x, y, z FROM w) "
        "AS f FROM r",
    ]
    for stmt in rewritten:
        out = rw(stmt)
        assert out != stmt, stmt
        assert "EXISTS" in out and "CAST(NULL AS BOOLEAN)" in out
        # the replacement is balanced and idempotent-ish: no NOT IN
        # subquery survives outside the embedded original text
        assert out.count("(") == out.count(")")
    # tuple emission shape (k=2): pairwise-equality match conjunction
    # plus the DECOMPOSED unknown guard — 8 equi/uncorrelated EXISTS
    # (aliases a..i), never the nested-loop `(pairwise =) IS NULL` form
    tout = rw("SELECT i, (i, j) NOT IN (SELECT v, u FROM w) AS f FROM r")
    assert "__nis_v0 = (i)" in tout and "__nis_v1 = (j)" in tout
    assert "__nis_v2" not in tout
    for sub in "abcdefghi":
        assert f"__nis17{sub}(__nis_v0, __nis_v1)" in tout, sub
    assert ") IS NULL)" not in tout  # no compact non-equi guard at k=2
    # k>=3 keeps the compact guard (documented scale cut)
    t3 = rw("SELECT i, (a.b, c.d, e) NOT IN (SELECT x, y, z FROM w) "
            "AS f FROM r")
    assert ") IS NULL)" in t3 and "__nis_v2" in t3

    # both branches in one statement: disjunctive one rewritten, the
    # conjunctive one preserved verbatim
    both = ("SELECT i FROM r WHERE (j = 3 OR i NOT IN (SELECT v FROM w)) "
            "AND k NOT IN (SELECT u FROM x)")
    out = rw(both)
    assert "k NOT IN (SELECT u FROM x)" in out
    assert "NOT EXISTS" in out


def test_quantified_cmp_rewrite_scope():
    """catalog._rewrite_quantified_cmp: only ``<identifier> <op>
    ANY|SOME|ALL (<subquery>)`` is rewritten — the any()/some() boolean
    AGGREGATES, literal operands, and expression probes pass through
    byte-identical (Spark parses the aggregates; the rest surface
    Spark's own error, since upstream has no quantified syntax to fall
    back to)."""
    from flink_spark.catalog import _rewrite_quantified_cmp as rw

    untouched = [
        # boolean aggregates, not quantifiers
        "SELECT any(flag) FROM r",
        "SELECT some(flag), every(flag) FROM r GROUP BY g",
        # no comparison operator before the quantifier keyword
        "SELECT i FROM r WHERE ANY (SELECT v FROM w) IS NOT NULL",
        # literal operand list (not a subquery)
        "SELECT i FROM r WHERE i > 1 AND all_vals = 3",
        # expression probe: out of scope
        "SELECT i FROM r WHERE i + 1 > ALL (SELECT v FROM w)",
        # quantifier inside a string literal
        "SELECT '> ALL (SELECT v FROM w)' AS s FROM r",
        # ADVICE r11 (medium): composite probe under || — the charset
        # walk would truncate to `t` and silently rewrite a string
        # concat where the reference parses `(s || t) > ALL (q)`;
        # the left adjacency guard skips it (fail-closed: Spark's own
        # parse error surfaces)
        "SELECT s || t > ALL (SELECT g FROM w) FROM r",
        "SELECT i FROM r WHERE s || t > ALL (SELECT g FROM w)",
        # ADVICE r11 (low): right-side adjacency — syntax BOTH engines
        # reject must not be liberally accepted via the rewrite
        "SELECT i FROM r WHERE i > ALL (SELECT v FROM w) IS NULL",
        "SELECT i > ALL (SELECT v FROM w) || 'x' FROM r",
        "SELECT i FROM r WHERE i - 1 < ANY (SELECT v FROM w)",
    ]
    for stmt in untouched:
        assert rw(stmt) == stmt, (stmt, rw(stmt))

    rewritten = [
        "SELECT i FROM r WHERE i > ALL (SELECT v FROM w)",
        "SELECT i FROM r WHERE i <> ALL (SELECT v FROM w) OR j = 3",
        "SELECT i FROM r WHERE i = ANY (SELECT v FROM w)",
        "SELECT i FROM r WHERE i <= SOME (WITH c AS (SELECT v FROM w) "
        "SELECT v FROM c)",
        "SELECT i >= ALL (SELECT v FROM w) AS f FROM r",
        "SELECT i FROM r WHERE a.b.`c` < ANY (SELECT v FROM w)",
        # parenthesized spellings: the adjacency guards must NOT block
        # these (the operator abuts the GROUP, not the bare predicate)
        "SELECT (i > ALL (SELECT v FROM w)) IS NULL AS f FROM r",
        "SELECT i FROM r WHERE (s || t) > CAST(NULL AS STRING) "
        "OR i > ALL (SELECT v FROM w)",
    ]
    for stmt in rewritten:
        out = rw(stmt)
        assert out != stmt, stmt
        assert "EXISTS" in out and "CAST(NULL AS BOOLEAN)" in out, stmt
        assert out.count("(") == out.count(")"), (stmt, out)
        assert not _QC_LEFTOVER.search(
            mask_literals(out).replace("__qc_v", "x")
        ), out
    # ALL and ANY produce the dual composites
    all_out = rw("SELECT i FROM r WHERE i > ALL (SELECT v FROM w)")
    assert "NOT EXISTS" in all_out
    any_out = rw("SELECT i FROM r WHERE i > ANY (SELECT v FROM w)")
    assert "NOT EXISTS" not in any_out and "EXISTS" in any_out


_QC_LEFTOVER = re.compile(
    r"[=<>!]\s*(?:ANY|SOME|ALL)\s*\(\s*(?:SELECT|WITH)\b", re.IGNORECASE
)


def test_subquery_rewrites_are_fixpoints():
    """Re-running either subquery rewrite on its own output is the
    identity: the EXISTS composites contain no [NOT] IN-subquery and no
    quantified comparison, so a double application (e.g. a statement
    passing through sql_query twice) can never stack rewrites."""
    from flink_spark.catalog import (
        _rewrite_nonconjunctive_not_in,
        _rewrite_quantified_cmp,
    )

    stmts = [
        "SELECT i, i NOT IN (SELECT v FROM w) AS f FROM r",
        "SELECT i FROM r WHERE j = 3 OR i NOT IN (SELECT v FROM w)",
        "SELECT i, i IN (SELECT v FROM w) AS f FROM r",
        "SELECT i FROM r WHERE i > ALL (SELECT v FROM w)",
        "SELECT i <= SOME (SELECT v FROM w) AS f FROM r",
    ]
    for s in stmts:
        for rw in (_rewrite_nonconjunctive_not_in,
                   _rewrite_quantified_cmp):
            once = rw(s)
            assert rw(once) == once, (rw.__name__, s)
        # and across the two rewrites in either order
        a = _rewrite_quantified_cmp(_rewrite_nonconjunctive_not_in(s))
        assert _rewrite_nonconjunctive_not_in(a) == a, s


def test_not_in_rewrite_nested_outermost_first():
    """ADVICE r10 medium: a disjunctive NOT IN NESTED inside another
    rewritten predicate's subquery used to corrupt offsets (the
    right-to-left pass sliced the outer span after the inner
    replacement changed its length), yielding unbalanced SQL and
    silently dropping BOTH fixes. Overlap resolution is now
    outermost-first: the outer rewrite applies, embedding the inner
    ORIGINAL text verbatim in each of its three branches."""
    from flink_spark.catalog import _rewrite_nonconjunctive_not_in as rw

    nested = ("SELECT i FROM r WHERE j = 3 OR i NOT IN "
              "(SELECT v FROM w WHERE a = 1 OR k NOT IN "
              "(SELECT u FROM z))")
    out = rw(nested)
    assert out != nested
    assert out.count("(") == out.count(")"), out
    assert out.count("k NOT IN (SELECT u FROM z)") == 3, out
    # sibling (non-nested) disjunctive predicates both rewrite
    siblings = ("SELECT i FROM r WHERE i NOT IN (SELECT v FROM w) "
                "OR k NOT IN (SELECT u FROM z)")
    out2 = rw(siblings)
    assert out2.count("NOT EXISTS") == 2
    assert out2.count("(") == out2.count(")"), out2
    # an inner NOT IN under a SAFE outer is still classified on its own
    inner_only = ("SELECT i FROM r WHERE i NOT IN (SELECT v FROM w "
                  "WHERE x = 1 OR k NOT IN (SELECT u FROM z))")
    out3 = rw(inner_only)
    assert out3.count("NOT EXISTS") == 1  # only the inner rewrote
    assert "i NOT IN (SELECT v FROM w" in out3
    assert out3.count("(") == out3.count(")"), out3


def test_not_in_fix_executes(spark, dialect_env):
    """End-to-end: the rewritten disjunctive NOT IN gives the SQL-
    standard three-valued answer through sql_query; a correlated
    subquery falls back to upstream semantics without erroring."""
    spark.createDataFrame(
        [(0,), (42,), (None,)], "i long"
    ).createOrReplaceTempView("nis_r")
    spark.createDataFrame(
        [(10,), (42,), (None,)], "v long"
    ).createOrReplaceTempView("nis_w")
    got = dialect_env.sql_query(
        "SELECT i FROM nis_r r WHERE r.i IN (SELECT v FROM nis_w) "
        "OR r.i NOT IN (SELECT v FROM nis_w)"
    ).collect()
    assert [r.i for r in got] == [42]
    # no NULLs in the subquery: NOT IN under OR is plain complement
    got2 = dialect_env.sql_query(
        "SELECT i FROM nis_r r WHERE 1 = 2 OR r.i NOT IN "
        "(SELECT v FROM nis_w w WHERE v IS NOT NULL) "
        "ORDER BY i NULLS FIRST"
    ).collect()
    assert [r.i for r in got2] == [0]  # NULL probe stays UNKNOWN
    # correlated: analysis probe fails, falls back, still executes
    got3 = dialect_env.sql_query(
        "SELECT i FROM nis_r r WHERE r.i = -1 OR r.i NOT IN "
        "(SELECT v FROM nis_w w WHERE w.v > r.i)"
    )
    assert got3.count() >= 0


def test_not_in_backticked_probes():
    """Backticked probes: a balanced quoted identifier is rewritten; an
    identifier with an inner space (the charset walk would truncate it
    to a malformed fragment) is skipped cleanly rather than relying on
    the analysis-probe fallback."""
    from flink_spark.catalog import _rewrite_nonconjunctive_not_in as rw

    spaced = "SELECT i FROM r WHERE `my col` NOT IN (SELECT v FROM w) OR j = 3"
    assert rw(spaced) == spaced
    plain = "SELECT i FROM r WHERE `col` NOT IN (SELECT v FROM w) OR j = 3"
    out = rw(plain)
    assert "NOT EXISTS" in out and "(`col`)" in out
    qual = "SELECT i FROM r WHERE `t`.`col` NOT IN (SELECT v FROM w) OR j = 3"
    assert "NOT EXISTS" in rw(qual)


def test_not_in_probe_never_executes_dml(dialect_env, spark):
    """The rewrite's analysis probe runs spark.sql on the candidate
    text, which is lazy for queries but EXECUTES commands — so a
    WITH-prefixed DML (legal in Spark's grammar) must never reach the
    probe, or the statement would run twice (r10 self-review finding).
    Proven with a real managed sink: after the statement completes,
    exactly the expected rows exist."""
    spark.sql("DROP TABLE IF EXISTS nis_probe_t")
    spark.sql("CREATE TABLE nis_probe_t (x INT) USING parquet")
    try:
        dialect_env.execute_sql(
            "WITH c AS (SELECT 1 AS x UNION ALL SELECT 2) "
            "INSERT INTO nis_probe_t SELECT x FROM c "
            "WHERE x NOT IN (SELECT 3) OR x = 1"
        )
        rows = sorted(
            r.x for r in spark.sql("SELECT x FROM nis_probe_t").collect()
        )
        # a probe-then-execute double-run would give [1, 1, 2, 2]
        assert rows == [1, 2], rows
    finally:
        spark.sql("DROP TABLE IF EXISTS nis_probe_t")


def test_insert_body_gets_subquery_rewrites(dialect_env, spark):
    """INSERT bodies are pure queries, so the [NOT] IN / quantified
    rewrites apply by probing the BODY alone (lazy): an INSERT whose
    WHERE uses `> ALL (<subquery>)` executes with standard semantics
    instead of dying on Spark's parser, and a complementary-dedup
    NOT IN in the body lands the standard rows. The whole-statement
    probe stays forbidden — proven by the row counts (a double
    execution would double the rows)."""
    spark.sql("DROP TABLE IF EXISTS nis_ins_t")
    spark.sql("CREATE TABLE nis_ins_t (x INT) USING parquet")
    try:
        dialect_env.execute_sql(
            "INSERT INTO nis_ins_t "
            "SELECT x FROM (SELECT 1 AS x UNION ALL SELECT 7) "
            "WHERE x > ALL (SELECT 2 UNION ALL SELECT 5)"
        )
        rows = sorted(
            r.x for r in spark.sql("SELECT x FROM nis_ins_t").collect()
        )
        assert rows == [7], rows  # quantified body worked, ran ONCE
        dialect_env.execute_sql(
            "INSERT INTO nis_ins_t "
            "SELECT x FROM (SELECT 3 AS x UNION ALL SELECT 9) "
            "WHERE x IN (SELECT 3) OR x NOT IN (SELECT 3)"
        )
        rows = sorted(
            r.x for r in spark.sql("SELECT x FROM nis_ins_t").collect()
        )
        # standard: 9 is UNKNOWN OR UNKNOWN -> excluded... no NULLs in
        # the set, so NOT IN (3) is TRUE for 9: both rows land — but
        # each exactly once (no probe double-run)
        assert rows == [3, 7, 9], rows
    finally:
        spark.sql("DROP TABLE IF EXISTS nis_ins_t")


def test_insert_body_null_capable_complement_standard(dialect_env, spark):
    """The body-level NOT IN rewrite restores standard semantics inside
    an INSERT: with a NULL in the subquery set, the complementary
    disjunction keeps only the genuine match (upstream would admit
    every row)."""
    spark.sql("DROP TABLE IF EXISTS nis_ins_u")
    spark.sql("CREATE TABLE nis_ins_u (x INT) USING parquet")
    try:
        dialect_env.execute_sql(
            "INSERT INTO nis_ins_u "
            "SELECT x FROM (SELECT 1 AS x UNION ALL SELECT 42) "
            "WHERE x IN (SELECT CAST(42 AS INT) UNION ALL "
            "            SELECT CAST(NULL AS INT)) "
            "   OR x NOT IN (SELECT CAST(42 AS INT) UNION ALL "
            "                SELECT CAST(NULL AS INT))"
        )
        rows = sorted(
            r.x for r in spark.sql("SELECT x FROM nis_ins_u").collect()
        )
        assert rows == [42], rows
    finally:
        spark.sql("DROP TABLE IF EXISTS nis_ins_u")


def test_quantified_correlated_executes(dialect_env, spark):
    """Correlated quantified comparisons work through the SAME
    derived-table composite (r12, measured): Spark 4.1.2 resolves
    outer references nested inside the wrap — the r11 'one correlation
    level too deep' note is obsolete. Exactness vs DuckDB's
    first-principles expansion is proven in test_differential_fuzz
    (test_correlated_quantified_agree, 96-case matrix); here: the
    rewrite fires, analyzes, and executes for plain, aggregated, and
    DISTINCT correlated Q."""
    spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "a long, b long"
    ).createOrReplaceTempView("qc_r")
    spark.createDataFrame(
        [(1, 4), (1, None), (3, 2)], "k long, v long"
    ).createOrReplaceTempView("qc_w")
    for q in [
        "SELECT r.a FROM qc_r r WHERE r.b > ALL "
        "(SELECT w.v FROM qc_w w WHERE w.k = r.a) ORDER BY r.a",
        "SELECT r.a FROM qc_r r WHERE r.b >= ANY "
        "(SELECT SUM(w.v) FROM qc_w w WHERE w.k = r.a) ORDER BY r.a",
        "SELECT r.a FROM qc_r r WHERE r.b <> ALL "
        "(SELECT DISTINCT w.v FROM qc_w w WHERE w.k = r.a) "
        "ORDER BY r.a",
    ]:
        rows = dialect_env.sql_query(q).collect()
        assert isinstance(rows, list)
    # ALL over the empty correlated set is TRUE: a=2 has no w rows
    got = [r.a for r in dialect_env.sql_query(
        "SELECT r.a FROM qc_r r WHERE r.b > ALL "
        "(SELECT w.v FROM qc_w w WHERE w.k = r.a AND w.v IS NOT NULL) "
        "ORDER BY r.a"
    ).collect()]
    assert 2 in got


def test_quantified_unsupported_shape_clean_error(dialect_env, spark):
    """Shapes whose outer references sit MORE than one subquery level
    from the quantified predicate cannot be planned by any rewrite (a
    splice form folding the comparison into Q's WHERE was prototyped
    and rescued neither shape — the nesting depth is intrinsic to the
    query). The engine must raise the clean unsupported-shape
    ValueError, never silently fall through to Spark's opaque
    ANY/ALL parse error."""
    spark.createDataFrame(
        [(1, 10)], "a long, b long"
    ).createOrReplaceTempView("qc_r2")
    spark.createDataFrame(
        [(1, 4)], "k long, v long"
    ).createOrReplaceTempView("qc_w2")
    bad = [
        # outer ref 2 levels deep inside Q (EXISTS within Q)
        "SELECT r.a FROM qc_r2 r WHERE r.b > ALL "
        "(SELECT w.v FROM qc_w2 w WHERE EXISTS "
        "(SELECT 1 FROM qc_w2 m WHERE m.k = r.a AND m.v = w.v))",
        # quantified inside a nested subquery correlating 2 levels out
        "SELECT (SELECT COUNT(*) FROM qc_w2 w WHERE w.v > ALL "
        "(SELECT m.v FROM qc_w2 m WHERE m.k = r.a)) AS c FROM qc_r2 r",
    ]
    import pytest as _pytest

    for q in bad:
        with _pytest.raises(ValueError, match="quantified comparison"):
            dialect_env.sql_query(q)
