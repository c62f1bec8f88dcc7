"""Pin the r12 evidence-audit manifest (tools/evidence_audit.py —
VERDICT r11 #8) against reality: every claimed gate must be a
registered, oracled query; every claimed fuzz/crash test function must
exist in tests/; the §2 component count must match SURVEY's inventory.
A renamed gate or deleted test fails HERE instead of silently rotting
the audit table in COVERAGE.md."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_manifest_clean_and_complete():
    from evidence_audit import MANIFEST, check

    errors, rows = check()
    assert errors == [], "\n".join(errors)
    in_s2 = [c for c in MANIFEST if c.sec != "LLM"]
    assert len(in_s2) == 107, len(in_s2)  # SURVEY §2 inventory size
    assert len([c for c in MANIFEST if c.sec == "LLM"]) == 14
    # every §2 component carries SOME artifact (gate, test, or is
    # native to Spark's execution) — coverage stays at 107/107
    for c in MANIFEST:
        assert c.gates or c.tests or c.fuzz or c.crash or c.native, c.name


def test_gap_queue_is_bounded_and_ranked():
    """The sev-0 queue (stateful operators without crash/restore
    evidence) is pinned EMPTY: the r12 audit surfaced eight such
    components and the same round closed them all
    (test_restore_stateful4.py + the pre-existing co-process
    cross-restart test folded in; idleness/alignment reclassified as
    per-drain traces with the durable watermark mechanism pinned by
    test_restore_watermark_survives_restart). A new stateful gate
    without restore evidence re-populates the queue and fails here."""
    from evidence_audit import check, gaps

    _, rows = check()
    sev0 = {name for sev, sec, name, _ in gaps(rows) if sev == 0}
    assert sev0 == set(), sev0


def test_all_registered_queries_belong_to_some_component():
    """Inverse direction: (almost) every registered gate appears in the
    manifest — a NEW operator gated without an evidence-audit row fails
    here, keeping the audit in sync as rounds add gates. TPC-H/TPC-DS
    shapes and fn_* suites are exercised as families, so only their
    representatives are listed; everything else must be mapped."""
    from flink_spark.queries.registry import QUERIES

    from evidence_audit import MANIFEST

    mapped = {g for c in MANIFEST for g in c.gates}
    family_prefixes = ("tpch_", "tpcds_", "fn_")
    unmapped = [
        n for n in QUERIES
        if n not in mapped and not n.startswith(family_prefixes)
    ]
    assert unmapped == [], f"gates with no evidence-audit row: {unmapped}"
