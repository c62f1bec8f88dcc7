"""Registry-order contract: external correctness harnesses sample the
first 50 registered queries, so the head of the registry is a curated,
rotating verification window.  Round 10 promotes the 27 gates that have
never had an external CORRECTNESS row (the r9 streaming-LLM family,
group-agg-retract ±TTL, DataStream V2, the curation e2e pair, the
multimodal trio, and 15 TPC-DS shapes) plus 22 freshness re-samples of
operators last externally verified in rounds 4-7 — retiring the
external-verification debt to zero.
"""

from __future__ import annotations

import json
import os

from flink_spark.queries import (
    QUERIES,
    VERIFICATION_ROTATION_R10_TAIL,
    promote_first,
)
from flink_spark.queries import VERIFICATION_ROTATION_R10 as ROTATION
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
    """The r10 head's raison d'être: after this round, every gated query
    has had at least one external CORRECTNESS row.  The 27 tail entries
    must (a) all be in the head and (b) all be absent from every prior
    round's artifact; every other gated query must appear in some prior
    artifact or in this head."""
    prev = _prior_round_keys(range(1, 10))
    if not prev:
        pytest.skip("no prior-round artifacts")
    assert len(VERIFICATION_ROTATION_R10_TAIL) == 27
    for name in VERIFICATION_ROTATION_R10_TAIL:
        assert name in ROTATION, name
        assert name not in prev, f"{name} was already externally sampled"
    # debt-zero check: nothing gated remains unsampled after this head,
    # except gates registered AFTER the r10 head froze — those must be
    # queued in the staged (mechanically-assembled) r11 head, which
    # slots never-sampled entries right behind the entry query
    from flink_spark.queries import VERIFICATION_ROTATION_R11_CANDIDATES

    uncovered = [n for n in QUERIES if n not in prev and n not in ROTATION]
    stragglers = set(uncovered) - set(VERIFICATION_ROTATION_R11_CANDIDATES)
    assert stragglers == set(), (
        f"never sampled and not queued for r11: {stragglers}"
    )
    assert len(uncovered) <= 3, (
        f"too many post-freeze gates piling up: {uncovered}"
    )


def test_freshness_slots_resample_previously_verified_queries():
    prev = _prior_round_keys(range(1, 10))
    if not prev:
        pytest.skip("no prior-round artifacts")
    fresh = [
        n
        for n in ROTATION
        if n not in VERIFICATION_ROTATION_R10_TAIL
        and n != "tpch_q1_pricing_summary"
    ]
    assert len(fresh) == 22
    for name in fresh:
        assert name in prev, f"freshness slot {name} was never sampled before"


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

    # real archive: after the r10 head is sampled, no gated query may
    # remain never-sampled, and the computed r11 head must be exactly
    # the 49 stalest + entry, all oracled
    repo = os.path.join(os.path.dirname(__file__), "..")
    archive = load_archive(repo)
    if not archive:
        pytest.skip("no prior-round artifacts")
    archive[10] = set(ROTATION)  # the driver samples this round's head
    head = compute_head(archive, list(QUERIES))
    assert len(head) == 50 and len(set(head)) == 50
    assert head[0] == "tpch_q1_pricing_summary"
    assert all(QUERIES[n].oracle is not None for n in head)
    # nothing in the r11 head was sampled this round (freshness advances)
    assert not (set(head) - {"tpch_q1_pricing_summary"}) & set(ROTATION)


def test_staged_r11_head_matches_policy():
    """The staged VERIFICATION_ROTATION_R11_CANDIDATES must be exactly
    what tools/next_head.py computes from the archive + this round's
    samples — heads self-assemble from round 11 on, and a drifted
    registry or archive fails here instead of silently staging the
    wrong head."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from next_head import compute_head, load_archive

    from flink_spark.queries import VERIFICATION_ROTATION_R11_CANDIDATES

    repo = os.path.join(os.path.dirname(__file__), "..")
    archive = load_archive(repo)
    if not archive:
        pytest.skip("no prior-round artifacts")
    if 10 not in archive:
        archive[10] = set(ROTATION)
    head = compute_head(archive, list(QUERIES))
    assert VERIFICATION_ROTATION_R11_CANDIDATES == head
