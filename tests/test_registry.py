"""Registry-order contract: external correctness harnesses sample the
first 50 registered queries, so the head of the registry is a curated,
rotating verification window.  From round 11 on, heads are MECHANICAL:
tools/next_head.py emits them from the CORRECTNESS archive (entry
first, never-sampled next in registry order, then stalest-first), and
the promoted head is pinned against that policy here.  The r11 head
carries the two never-sampled NOT IN three-valued gates
(sql_not_in_disjunctive from r10, sql_not_in_projected from r11) and 47
freshness re-samples of the r3-r6-verified relational core (tpch
q2-q22, agg_*/join_*/set_*).
"""

from __future__ import annotations

import json
import os

from flink_spark.queries import (
    QUERIES,
    VERIFICATION_ROTATION_R10,
    promote_first,
)
from flink_spark.queries import VERIFICATION_ROTATION_R11 as ROTATION
import pytest

# rows-only entries deliberately promoted for an external row despite
# having no SQL-expressible oracle (the driver records the weaker check).
# Empty since r9: every gated query carries an exact DuckDB oracle.
ROWS_ONLY_PROMOTED: set = set()


def _prior_round_keys(rounds) -> set:
    base = os.path.join(os.path.dirname(__file__), "..")
    prev: set = set()
    for r in rounds:
        p = os.path.join(base, f"CORRECTNESS_r{r:02d}.json")
        if os.path.exists(p):
            prev |= set(json.load(open(p)))
    return prev


def test_rotation_is_registry_head():
    keys = list(QUERIES)
    assert len(ROTATION) == 50
    assert len(set(ROTATION)) == 50
    assert keys[: len(ROTATION)] == ROTATION


def test_entry_query_stays_first():
    # __spark_entry__.entry() runs the first registered query
    assert next(iter(QUERIES)) == "tpch_q1_pricing_summary"


def test_rotation_head_is_fully_oracled():
    # every sampled entry must carry an exact DuckDB oracle — the rotation
    # exists to BUY exact external rows, not rows-only checks. The
    # documented exceptions are listed in ROWS_ONLY_PROMOTED.
    for name in ROTATION:
        if name in ROWS_ONLY_PROMOTED:
            assert QUERIES[name].oracle is None, name
            continue
        assert QUERIES[name].oracle is not None, name


def test_rotation_retires_all_never_sampled_gates():
    """Debt stays at zero: every gated query must either carry a prior
    external CORRECTNESS row (r1-r10) or sit in THIS head (the policy
    slots never-sampled gates right behind the entry query — for r11
    that is exactly the two NOT IN three-valued gates)."""
    prev = _prior_round_keys(range(1, 11))
    if not prev:
        pytest.skip("no prior-round artifacts")
    never = [n for n in QUERIES if n not in prev]
    uncovered = [n for n in never if n not in ROTATION]
    assert uncovered == [], f"never sampled and not in this head: {uncovered}"
    assert len(never) <= 4, f"too many never-sampled gates: {never}"
    # the policy places them immediately after the entry
    k = len([n for n in never if n != "tpch_q1_pricing_summary"])
    assert set(ROTATION[1:1 + k]) == set(never) - {"tpch_q1_pricing_summary"}


def test_freshness_slots_resample_previously_verified_queries():
    prev = _prior_round_keys(range(1, 11))
    if not prev:
        pytest.skip("no prior-round artifacts")
    never = {"sql_not_in_disjunctive", "sql_not_in_projected",
             "sql_quantified_any_all"}
    assert never == {n for n in ROTATION if n not in prev}
    fresh = [
        n for n in ROTATION
        if n not in never and n != "tpch_q1_pricing_summary"
    ]
    assert len(fresh) == 46
    for name in fresh:
        assert name in prev, f"freshness slot {name} was never sampled before"
        # freshness means STALE: nothing re-sampled that r10 just covered
        assert name not in VERIFICATION_ROTATION_R10, name


def test_promote_first_rejects_unknown_and_duplicate():
    with pytest.raises(KeyError):
        promote_first(["no_such_query"])
    with pytest.raises(ValueError):
        promote_first(["tpch_q1_pricing_summary", "tpch_q1_pricing_summary"])
    # registry unchanged by the failed calls
    assert list(QUERIES)[:50] == ROTATION


def test_next_head_policy_mechanical():
    """tools/next_head.py is the standing freshness rule (VERDICT r9 #8):
    entry first, never-sampled next in registry order, then stalest-first.
    Pin the policy on synthetic history, then check the real archive +
    this round's head produce a valid, debt-free r11 head."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from next_head import compute_head, load_archive

    order = ["tpch_q1_pricing_summary", "a", "b", "c", "d", "e"]
    archive = {1: {"a", "c"}, 2: {"c", "e"}, 3: {"tpch_q1_pricing_summary"}}
    # entry pinned; 'b','d' never sampled (registry order); then staleness:
    # a(r1) before e(r2) before c(r2... c last sampled r2) — a then c,e by
    # (round, registry position): a@1, c@2, e@2 → c before e
    assert compute_head(archive, order, head_size=6) == [
        "tpch_q1_pricing_summary", "b", "d", "a", "c", "e"
    ]
    # truncation respects priority order
    assert compute_head(archive, order, head_size=3) == [
        "tpch_q1_pricing_summary", "b", "d"
    ]

    # real archive: once the r11 head is sampled, the computed r12 head
    # must be debt-free (no never-sampled gates remain), fully oracled,
    # and advance freshness past this round's samples
    repo = os.path.join(os.path.dirname(__file__), "..")
    archive = load_archive(repo)
    if not archive:
        pytest.skip("no prior-round artifacts")
    archive[11] = set(ROTATION)  # the driver samples this round's head
    head = compute_head(archive, list(QUERIES))
    assert len(head) == 50 and len(set(head)) == 50
    assert head[0] == "tpch_q1_pricing_summary"
    assert all(QUERIES[n].oracle is not None for n in head)
    # nothing in the r12 preview was sampled this round (freshness advances)
    assert not (set(head) - {"tpch_q1_pricing_summary"}) & set(ROTATION)


def test_promoted_r11_head_matches_policy():
    """The PROMOTED r11 head must be exactly what tools/next_head.py
    computes from the r1-r10 archive — heads self-assemble from round
    11 on, and a drifted registry or archive fails here instead of
    silently promoting the wrong head. (Regenerated mid-round when
    sql_not_in_projected was gated: the policy is a fixpoint of
    promotion, so recomputing against the promoted registry must
    reproduce the promoted constant.)"""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from next_head import compute_head, load_archive

    repo = os.path.join(os.path.dirname(__file__), "..")
    # rounds 1-10 only: the r11 head was computed BEFORE this round's
    # artifact existed, so the pin must not drift when the driver lands
    # CORRECTNESS_r11.json (recomputing over it would yield the r12
    # head — that promotion is next round's first chore)
    archive = {r: v for r, v in load_archive(repo).items() if r <= 10}
    if not archive:
        pytest.skip("no prior-round artifacts")
    head = compute_head(archive, list(QUERIES))
    assert ROTATION == head
