"""EXPLAIN CHANGELOG_MODE analog (reference ExplainDetail#CHANGELOG_MODE,
ExplainDetail.java:36, and FlinkChangelogModeInferenceProgram.scala — the
two-pass trait inference SURVEY §4.1 calls the hardest semantic gap).

The reference infers, for every edge of a streaming physical plan, which
row kinds flow across it — rendered as ``changelogMode=[I,UB,UA,D]`` per
node in EXPLAIN output. The inference is two visitors:

1. **ModifyKindSetTrait** (bottom-up with top-down requirements): which of
   {INSERT, UPDATE, DELETE} each node can produce, validated against what
   its parent can consume (e.g. an interval join rejects updating input:
   "X doesn't support consuming update changes...").
2. **UpdateKindTrait** (top-down requirement, backtracking): HOW updates
   are encoded — BEFORE_AND_AFTER (retract: UB+UA), ONLY_UPDATE_AFTER
   (upsert: UA only), or NONE. A sink with a primary key satisfied by the
   input's upsert key prefers ONLY_UPDATE_AFTER; a CDC source that must
   serve an only-after consumer gets a DropUpdateBefore node injected.

This module reproduces both passes over a small streaming-plan IR whose
node kinds map 1:1 onto the operators of flink_spark's streaming layer
(changelog.py / deltajoin.py / windows / rank), then renders the
Flink-shaped tree. The SQL spelling ``EXPLAIN CHANGELOG_MODE <query>``
(catalog.py) builds the IR from Spark's analyzed logical plan plus the
catalog's knowledge of source changelog modes (PK'd tables = upsert
sources).

Rule provenance (all from FlinkChangelogModeInferenceProgram.scala):
- group_agg: requires ALL; provides {I,U} ∪ ({D} if input has U or D)
- rank/topn: requires ALL; provides ALL ({I,U,D})
- dedup: insert-only input + keep-first → insert-only, else ALL
- window agg / window rank / window dedup / interval join / window join /
  temporal sort / CEP: insert-only in, insert-only out
- changelog_normalize: requires ALL of child, provides ALL; child is
  required ONLY_UPDATE_AFTER (it exists to materialize upsert streams)
- calc / correlate / lookup / exchange / watermark / window TVF:
  transparent forward
- join inner/semi: union of child sets; outer joins: ALL
- union: union of child sets; mixing only-after and before-after → reject
- sinks: append requires insert-only; retract requires BEFORE_AND_AFTER;
  upsert prefers ONLY_UPDATE_AFTER when the input's upsert key satisfies
  the sink PK, falling back to BEFORE_AND_AFTER (inferSinkRequiredTraits)
- stringification: I / UB / UA / D, sink renders NONE
  (ChangelogPlanUtils.stringifyChangelogMode)
"""

from __future__ import annotations

from dataclasses import dataclass, field

I, U, D = "I", "U", "D"
INSERT_ONLY = frozenset({I})
ALL_CHANGES = frozenset({I, U, D})

# UpdateKind values
NONE = "NONE"
ONLY_UPDATE_AFTER = "ONLY_UPDATE_AFTER"
BEFORE_AND_AFTER = "BEFORE_AND_AFTER"

# DeleteKind values (third trait pass, SatisfyDeleteKindTraitVisitor):
# DELETE_BY_KEY = deletes carry only valid key fields (upsert-kafka
# tombstones) — rendered "PD" (partial delete); FULL_DELETE = whole row.
DK_NONE = "NONE"
DELETE_BY_KEY = "DELETE_BY_KEY"
FULL_DELETE = "FULL_DELETE"


class ChangelogModeError(ValueError):
    """Raised when a plan cannot satisfy the required changelog traits —
    the analog of the reference's TableException from createNewNode."""


@dataclass
class Node:
    """One streaming operator in the IR. ``attrs`` carries the per-kind
    knobs: source mode ('insert'|'upsert'|'cdc'), sink mode
    ('append'|'retract'|'upsert'), sink/source ``pk``, agg ``keys``,
    dedup ``keep`` ('first'|'last'), join ``how``."""

    kind: str
    name: str = ""
    children: list["Node"] = field(default_factory=list)
    attrs: dict = field(default_factory=dict)
    # filled by inference:
    modify_kinds: frozenset = None  # type: ignore[assignment]
    update_kind: str = None  # type: ignore[assignment]
    delete_kind: str = None  # type: ignore[assignment]
    upsert_keys: frozenset | None = None

    def label(self) -> str:
        return self.name or self.kind


# node kinds that forward their child's traits untouched
_TRANSPARENT = {
    "calc", "filter", "project", "correlate", "lookup_join", "exchange",
    "watermark", "window_tvf", "ml_predict", "vector_search",
}
# insert-only in, insert-only out
_INSERT_ONLY_OPS = {
    "window_agg", "window_rank", "window_dedup", "interval_join",
    "window_join", "temporal_sort", "cep", "match_recognize",
}

_SOURCE_MODES = {
    "insert": (INSERT_ONLY, NONE),
    "upsert": (ALL_CHANGES, ONLY_UPDATE_AFTER),   # e.g. upsert-kafka: I,UA,D
    "cdc": (ALL_CHANGES, BEFORE_AND_AFTER),       # e.g. debezium: I,UB,UA,D
}


def _union(*sets: frozenset) -> frozenset:
    out: frozenset = frozenset()
    for s in sets:
        out = out | s
    return out


def _before_after_or_none(mks: frozenset) -> str:
    return BEFORE_AND_AFTER if U in mks else NONE


def _only_after_or_none(mks: frozenset) -> str:
    return ONLY_UPDATE_AFTER if U in mks else NONE


def _infer_modify_kinds(node: Node, required: frozenset, requester: str) -> None:
    """Pass 1 (SatisfyModifyKindSetTraitVisitor): annotate
    ``node.modify_kinds`` bottom-up, validating against ``required``."""
    k = node.kind
    if k == "source":
        mode = node.attrs.get("mode", "insert")
        provided = _SOURCE_MODES[mode][0]
        node.upsert_keys = (
            frozenset(node.attrs["pk"]) if node.attrs.get("pk") else None
        )
    elif k == "sink":
        sink_mode = node.attrs.get("mode", "append")
        child_req = INSERT_ONLY if sink_mode == "append" else ALL_CHANGES
        _infer_modify_kinds(node.children[0], child_req, f"{sink_mode} sink")
        node.modify_kinds = frozenset()  # sink trait is EMPTY → "NONE"
        node.upsert_keys = None
        return
    elif k == "group_agg":
        _infer_modify_kinds(node.children[0], ALL_CHANGES, node.label())
        cmks = node.children[0].modify_kinds
        provided = frozenset({I, U}) | (
            frozenset({D}) if (U in cmks or D in cmks) else frozenset()
        )
        node.upsert_keys = frozenset(node.attrs.get("keys", ()))
    elif k in ("rank", "topn", "sort_limit"):
        _infer_modify_kinds(node.children[0], ALL_CHANGES, node.label())
        provided = ALL_CHANGES
        node.upsert_keys = None
    elif k == "dedup":
        _infer_modify_kinds(node.children[0], ALL_CHANGES, node.label())
        child_insert_only = node.children[0].modify_kinds == INSERT_ONLY
        if child_insert_only and node.attrs.get("keep", "first") == "first":
            provided = INSERT_ONLY
        else:
            provided = ALL_CHANGES
        node.upsert_keys = frozenset(node.attrs.get("keys", ()))
    elif k == "normalize":
        _infer_modify_kinds(node.children[0], ALL_CHANGES, node.label())
        provided = ALL_CHANGES
        node.upsert_keys = frozenset(node.attrs.get("pk", ()))
    elif k in _INSERT_ONLY_OPS:
        for c in node.children:
            _infer_modify_kinds(c, INSERT_ONLY, node.label())
        provided = INSERT_ONLY
        node.upsert_keys = None
    elif k == "sort":
        # Sort consumes all changes, buffers, emits insert-only on finish
        _infer_modify_kinds(node.children[0], ALL_CHANGES, node.label())
        provided = INSERT_ONLY
        node.upsert_keys = None
    elif k == "join":
        for c in node.children:
            _infer_modify_kinds(c, ALL_CHANGES, node.label())
        how = node.attrs.get("how", "inner")
        if how in ("inner", "semi"):
            provided = _union(*[c.modify_kinds for c in node.children])
        else:
            provided = ALL_CHANGES
        node.upsert_keys = None
    elif k == "temporal_join":
        for c in node.children:
            _infer_modify_kinds(c, ALL_CHANGES, node.label())
        provided = node.children[0].modify_kinds  # forward left
        node.upsert_keys = node.children[0].upsert_keys
    elif k == "union":
        for c in node.children:
            _infer_modify_kinds(c, required, requester)
        provided = _union(*[c.modify_kinds for c in node.children])
        node.upsert_keys = None
    elif k in _TRANSPARENT:
        _infer_modify_kinds(node.children[0], required, requester)
        provided = node.children[0].modify_kinds
        node.upsert_keys = node.children[0].upsert_keys
    elif k == "drop_update_before":
        _infer_modify_kinds(node.children[0], required, requester)
        provided = node.children[0].modify_kinds
        node.upsert_keys = node.children[0].upsert_keys
    elif k == "over_agg":
        # row-time ordered over agg: insert-only in/out (the common case)
        _infer_modify_kinds(node.children[0], INSERT_ONLY, node.label())
        provided = INSERT_ONLY
        node.upsert_keys = None
    else:
        raise ChangelogModeError(f"unknown streaming node kind {k!r}")

    if not provided <= required:
        diff = sorted(provided - required)
        names = {"I": "insert", "U": "update", "D": "delete"}
        diff_s = " and ".join(names[x] for x in diff)
        raise ChangelogModeError(
            f"{requester} doesn't support consuming {diff_s} changes "
            f"which is produced by node {node.label()}"
        )
    node.modify_kinds = provided


def _infer_update_kinds(node: Node, required: str) -> bool:
    """Pass 2 (SatisfyUpdateKindTraitVisitor): annotate
    ``node.update_kind`` top-down; returns False when the subtree cannot
    satisfy ``required`` (the caller backtracks to the next alternative)."""
    k = node.kind
    if k == "source":
        mode = node.attrs.get("mode", "insert")
        provided = _SOURCE_MODES[mode][1]
        if U not in node.modify_kinds:
            provided = NONE
        if provided == BEFORE_AND_AFTER and required == ONLY_UPDATE_AFTER:
            # CDC source serving an only-after consumer: the reference
            # injects StreamPhysicalDropUpdateBefore; mark it for render
            node.attrs["__drop_update_before"] = True
            node.update_kind = ONLY_UPDATE_AFTER
            return True
        if provided == ONLY_UPDATE_AFTER and required == BEFORE_AND_AFTER:
            return False  # upsert source cannot synthesize UPDATE_BEFORE
        node.update_kind = provided
        return True
    if k == "sink":
        child = node.children[0]
        cmks = child.modify_kinds
        sink_mode = node.attrs.get("mode", "append")
        if sink_mode == "append":
            tries = [NONE]
        elif sink_mode == "retract":
            tries = [_before_after_or_none(cmks)]
        else:  # upsert
            only_after = _only_after_or_none(cmks)
            pk = frozenset(node.attrs.get("pk", ()))
            uk = child.upsert_keys
            pk_satisfied = uk is not None and uk <= pk and len(uk) > 0
            if only_after == ONLY_UPDATE_AFTER and not pk_satisfied:
                tries = [_before_after_or_none(cmks)]
            else:
                tries = [only_after, _before_after_or_none(cmks)]
        for t in tries:
            if _infer_update_kinds(child, t):
                node.update_kind = NONE
                return True
        raise ChangelogModeError(
            f"sink {node.label()} cannot be satisfied: input does not "
            f"support any of the required update modes {tries}"
        )
    if k in ("group_agg", "over_agg", "sort", "dedup_agg"):
        # aggregates require update_before if the input produces updates
        child_req = _before_after_or_none(node.children[0].modify_kinds)
        if not _infer_update_kinds(node.children[0], child_req):
            return False
        node.update_kind = required
        return True
    if k in ("rank", "topn", "sort_limit"):
        child = node.children[0]
        cmks = child.modify_kinds
        if required == ONLY_UPDATE_AFTER:
            # UpdateFastStrategy needs the input's unique key to contain
            # the partition key (inputUniqueKeyContainsJoinKey analog)
            part = frozenset(node.attrs.get("partition", ()))
            uk = child.upsert_keys
            fast_ok = (
                cmks == INSERT_ONLY
                or (uk is not None and len(uk) > 0 and uk <= part)
            )
            child_req = (
                _only_after_or_none(cmks) if fast_ok
                else _before_after_or_none(cmks)
            )
            if not fast_ok and child_req == BEFORE_AND_AFTER:
                # retract strategy feeds an only-after parent: allowed —
                # rank re-encodes (RetractStrategy emits what parent asks)
                pass
            if not _infer_update_kinds(child, child_req):
                return False
        else:
            if not _infer_update_kinds(child, _before_after_or_none(cmks)):
                return False
        node.update_kind = required
        return True
    if k in ("dedup",) or k in _INSERT_ONLY_OPS:
        for c in node.children:
            if not _infer_update_kinds(c, NONE):
                return False
        node.update_kind = required if node.modify_kinds != INSERT_ONLY else NONE
        return True
    if k == "normalize":
        if not _infer_update_kinds(node.children[0], ONLY_UPDATE_AFTER):
            return False
        node.update_kind = required
        return True
    if k in ("join", "temporal_join"):
        only_after_by_parent = required == ONLY_UPDATE_AFTER
        for i, c in enumerate(node.children):
            cmks = c.modify_kinds
            if only_after_by_parent:
                uk = c.upsert_keys
                keys = frozenset(
                    node.attrs.get("left_keys" if i == 0 else "right_keys", ())
                )
                support_only_after = uk is not None and len(uk) > 0 and uk <= keys
                if U in cmks and not support_only_after:
                    return False
                if not _infer_update_kinds(c, _only_after_or_none(cmks)):
                    return False
            else:
                if not _infer_update_kinds(c, _before_after_or_none(cmks)):
                    return False
        node.update_kind = required
        return True
    if k == "union":
        kinds = []
        for c in node.children:
            creq = NONE if c.modify_kinds == INSERT_ONLY else required
            if not _infer_update_kinds(c, creq):
                return False
            kinds.append(c.update_kind)
        merged = NONE
        for uk in kinds:
            if uk == NONE:
                continue
            if merged == NONE:
                merged = uk
            elif merged != uk:
                return False  # can't union ONLY_AFTER with BEFORE_AFTER
        node.update_kind = merged
        return True
    if k in _TRANSPARENT or k == "drop_update_before":
        if not _infer_update_kinds(node.children[0], required):
            return False
        node.update_kind = node.children[0].update_kind
        return True
    raise ChangelogModeError(f"unknown streaming node kind {k!r}")


def _full_delete_or_none(mks: frozenset) -> str:
    return FULL_DELETE if D in mks else DK_NONE


def _delete_on_key_or_none(mks: frozenset) -> str:
    return DELETE_BY_KEY if D in mks else DK_NONE


def _infer_delete_kinds(node: Node, required: str) -> bool:
    """Pass 3 (SatisfyDeleteKindTraitVisitor): annotate
    ``node.delete_kind`` top-down with backtracking. Key-only-delete
    sources (upsert mode — the upsert-kafka tombstone analog) provide
    DELETE_BY_KEY; ChangelogNormalize accepts either but produces full
    deletes; stateful operators require full deletes of updating inputs;
    a key-delete upsert sink prefers DELETE_BY_KEY (inferSinkRequiredTraits
    delete variant)."""

    def satisfied(provided: str) -> bool:
        return provided == required or provided == DK_NONE

    k = node.kind
    if k == "source":
        mode = node.attrs.get("mode", "insert")
        if D not in node.modify_kinds:
            provided = DK_NONE
        elif mode == "upsert":
            provided = DELETE_BY_KEY
        else:
            provided = FULL_DELETE
        if not satisfied(provided):
            return False
        node.delete_kind = provided
        return True
    if k == "sink":
        child = node.children[0]
        cmks = child.modify_kinds
        sink_mode = node.attrs.get("mode", "append")
        if sink_mode == "append":
            tries = [DK_NONE]
        elif sink_mode == "upsert":
            pk = frozenset(node.attrs.get("pk", ()))
            uk = child.upsert_keys
            pk_served = uk is not None and len(uk) > 0 and uk <= pk
            if pk_served:
                # key-delete-capable sink: prefer key-only deletes
                tries = [_delete_on_key_or_none(cmks),
                         _full_delete_or_none(cmks)]
            else:
                tries = [_full_delete_or_none(cmks)]
        else:
            tries = [_full_delete_or_none(cmks)]
        for t in tries:
            if _infer_delete_kinds(child, t):
                node.delete_kind = DK_NONE
                return True
        raise ChangelogModeError(
            f"sink {node.label()} cannot satisfy any delete-kind in {tries}"
        )
    if k == "normalize":
        child = node.children[0]
        cmks = child.modify_kinds
        # prefer delete by key, accept both; normalize EMITS full deletes
        if not _infer_delete_kinds(child, _delete_on_key_or_none(cmks)):
            if not _infer_delete_kinds(child, _full_delete_or_none(cmks)):
                return False
        provided = _full_delete_or_none(node.modify_kinds)
        if not satisfied(provided):
            return False
        node.delete_kind = provided
        return True
    if k == "union":
        kinds = []
        for c in node.children:
            creq = DK_NONE if D not in c.modify_kinds else required
            if not _infer_delete_kinds(c, creq):
                return False
            kinds.append(c.delete_kind)
        merged = DK_NONE
        for dk in kinds:
            if dk == DK_NONE:
                continue
            merged = dk if merged == DK_NONE else (
                dk if dk == merged else DELETE_BY_KEY
            )
        node.delete_kind = merged
        return satisfied(merged)
    if k in _TRANSPARENT or k == "drop_update_before":
        if not _infer_delete_kinds(node.children[0], required):
            return False
        node.delete_kind = node.children[0].delete_kind
        return True
    # every other operator: full deletes of updating inputs, provides
    # full deletes when it can delete at all
    for c in node.children:
        if not _infer_delete_kinds(c, _full_delete_or_none(c.modify_kinds)):
            return False
    provided = _full_delete_or_none(node.modify_kinds)
    if not satisfied(provided):
        return False
    node.delete_kind = provided
    return True


def infer(root: Node) -> Node:
    """Run both passes. ``root`` should be a sink node (or any node — a
    non-sink root is treated like the reference's toRetractStream
    consumer: BEFORE_AND_AFTER when the query produces updates)."""
    if root.kind == "sink":
        _infer_modify_kinds(root, frozenset(), "root")
        _infer_update_kinds(root, NONE)
        _infer_delete_kinds(root, DK_NONE)
    else:
        _infer_modify_kinds(root, ALL_CHANGES, "root")
        req = _before_after_or_none(root.modify_kinds)
        if not _infer_update_kinds(root, req):
            raise ChangelogModeError("plan cannot satisfy retract consumer")
        if not _infer_delete_kinds(root, _full_delete_or_none(root.modify_kinds)):
            raise ChangelogModeError("plan cannot satisfy full-delete consumer")
    return root


def mode_string(node: Node) -> str:
    """ChangelogPlanUtils.stringifyChangelogMode over the inferred traits."""
    mks, uk = node.modify_kinds, node.update_kind
    if mks is None:
        raise ChangelogModeError("run infer() first")
    if not mks:
        return "NONE"
    kinds = []
    if I in mks:
        kinds.append("I")
    if U in mks and uk == BEFORE_AND_AFTER:
        kinds.append("UB")
    if U in mks and uk in (BEFORE_AND_AFTER, ONLY_UPDATE_AFTER):
        kinds.append("UA")
    if D in mks:
        # keyOnlyDeletes → "PD" (ChangelogPlanUtils.stringifyChangelogMode)
        kinds.append("PD" if node.delete_kind == DELETE_BY_KEY else "D")
    return ",".join(kinds)


def _walk(node: Node, depth: int, out: list):
    label = node.label()
    out.append((depth, label, mode_string(node)))
    if node.attrs.get("__drop_update_before"):
        # render the injected DropUpdateBefore the way EXPLAIN does: as a
        # parent of the source it rewrites
        out[-1] = (depth, "DropUpdateBefore", mode_string(node))
        out.append((depth + 1, label, mode_string(node)))
    for c in node.children:
        _walk(c, depth + 1, out)


def explain(root: Node) -> str:
    """Flink-shaped EXPLAIN CHANGELOG_MODE text: one node per line,
    ``+- `` tree scaffolding, ``changelogMode=[...]`` per node."""
    infer(root)
    rows = []
    _walk(root, 0, rows)
    lines = []
    for depth, label, mode in rows:
        prefix = "" if depth == 0 else "   " * (depth - 1) + "+- "
        lines.append(f"{prefix}{label}(changelogMode=[{mode}])")
    return "\n".join(lines)


_JOIN_HOW = {
    "Inner": "inner", "Cross": "inner", "LeftOuter": "left",
    "RightOuter": "right", "FullOuter": "full", "LeftSemi": "semi",
    "LeftAnti": "anti",
}


def ir_from_analyzed(plan_text: str, pk_tables: dict) -> Node:
    """Build the streaming IR from a Spark ANALYZED logical-plan string
    (the SQL spelling ``EXPLAIN CHANGELOG_MODE <query>`` in catalog.py).

    ``pk_tables`` maps table name → list of primary-key columns; a PK'd
    catalog table is treated as an upsert source and (like the reference
    planner does for upsert-kafka scans) gets a ChangelogNormalize node
    injected above it. Plain tables/views are insert-only scans.

    Mapping: Aggregate/Distinct → GroupAggregate, Project/Filter → Calc
    (consecutive ones collapse, as Flink's Calc does), Join <how> → Join,
    Union → Union, Window → OverAggregate, Sort/Limit → Sort,
    Deduplicate → Deduplicate, leaf Relation → TableSourceScan."""
    import re as _re

    lines = [ln for ln in plan_text.splitlines() if ln.strip()]

    parsed: list[tuple[int, str]] = []
    for raw in lines:
        marker = raw.find("+- ")
        if marker < 0:
            marker = raw.find(":- ")
        depth = 0 if marker < 0 else marker // 3 + 1
        body = raw[marker + 3 :] if marker >= 0 else raw.strip()
        parsed.append((depth, body.strip()))

    # recursive descent over (depth, body) with an index cursor
    def build(i: int, depth: int, alias: str | None):
        if i >= len(parsed):
            return None, i
        d, body = parsed[i]
        head = body.split(" ", 1)[0].split("[", 1)[0].rstrip(",")

        if head in ("SubqueryAlias", "View"):
            m = _re.search(r"[`']?(\w+)[`']?", body.split(" ", 1)[1])
            name = m.group(1) if m else None
            if name in pk_tables:
                # a PK'd engine table IS the (upsert) source, however the
                # catalog physically realizes it (Relation, Range, local
                # rows) — skip its expansion subtree entirely
                j = i + 1
                while j < len(parsed) and parsed[j][0] > d:
                    j += 1
                pk = pk_tables[name]
                src = Node(
                    "source", f"TableSourceScan({name})",
                    attrs={"mode": "upsert", "pk": pk},
                )
                return (
                    Node("normalize", "ChangelogNormalize", [src],
                         attrs={"pk": pk}),
                    j,
                )
            # descend; innermost alias (the view/table name) wins only if
            # none was seen yet at this chain
            node, j = build(i + 1, depth + 1, alias or name)
            return node, j
        if head == "Relation":
            name = alias or "source"
            pk = pk_tables.get(name)
            src = Node(
                "source", f"TableSourceScan({name})",
                attrs={"mode": "upsert" if pk else "insert", "pk": pk},
            )
            if pk:
                src = Node(
                    "normalize", "ChangelogNormalize", [src], attrs={"pk": pk}
                )
            return src, i + 1
        if head in ("LocalRelation", "OneRowRelation", "Range"):
            return Node("source", "Values", attrs={"mode": "insert"}), i + 1
        if head in ("Aggregate", "Distinct"):
            keys: list[str] = []
            m = _re.match(r"Aggregate \[([^\]]*)\](, \[)?", body)
            if m and body.count("[") >= 2:
                keys = [
                    c.strip().split("#", 1)[0]
                    for c in m.group(1).split(",")
                    if c.strip()
                ]
            child, j = build(i + 1, depth + 1, alias)
            return (
                Node("group_agg", "GroupAggregate", [child], attrs={"keys": keys}),
                j,
            )
        if head in ("Project", "Filter"):
            child, j = build(i + 1, depth + 1, alias)
            if child is not None and child.kind == "calc":
                return child, j  # collapse adjacent Calcs like the reference
            return Node("calc", "Calc", [child]), j
        if head == "Join":
            m = _re.match(r"Join (\w+)", body)
            how = _JOIN_HOW.get(m.group(1) if m else "Inner", "inner")
            left, j = build(i + 1, depth + 1, None)
            right, j = build(j, depth + 1, None)
            return Node("join", "Join", [left, right], attrs={"how": how}), j
        if head in ("Union",):
            kids = []
            j = i + 1
            while j < len(parsed) and parsed[j][0] == depth + 1:
                node, j = build(j, depth + 1, None)
                kids.append(node)
            return Node("union", "Union", kids), j
        if head == "Window":
            child, j = build(i + 1, depth + 1, alias)
            return Node("over_agg", "OverAggregate", [child]), j
        if head in ("Sort", "GlobalLimit", "LocalLimit"):
            child, j = build(i + 1, depth + 1, alias)
            if child is not None and child.kind == "sort":
                return child, j
            return Node("sort", "Sort", [child]), j
        if head == "Deduplicate":
            child, j = build(i + 1, depth + 1, alias)
            return Node("dedup", "Deduplicate", [child], attrs={"keep": "first"}), j
        # transparent/unknown wrapper: descend
        child, j = build(i + 1, depth + 1, alias)
        if child is None:
            return Node("source", "Values", attrs={"mode": "insert"}), i + 1
        return child, j

    root, _ = build(0, 0, None)
    if root is None:
        raise ChangelogModeError("empty plan")
    return root


def modes_table(root: Node) -> list[tuple[str, str]]:
    """(node_label, changelog_mode) rows in pre-order — the gated-query
    shape (hash-comparable against a VALUES oracle)."""
    infer(root)
    rows = []
    _walk(root, 0, rows)
    return [(label, mode) for _, label, mode in rows]


# -- Non-deterministic update (NDU) analysis --------------------------------

ALL_COLUMNS = frozenset({"*"})

_NDU_COLUMN_MSG = (
    "can not satisfy the determinism requirement for correctly processing "
    "update message('UB'/'UA'/'D' in changelogMode, not 'I' only), this "
    "usually happens when input node has no upsertKey(upsertKeys=[{}]) or "
    "current node outputs non-deterministic update messages. Please "
    "consider removing these non-deterministic columns or making them "
    "deterministic by using deterministic functions."
)
_NDU_CONDITION_MSG = (
    "There exists non deterministic function: '{fn}' in condition: "
    "'{cond}' which may cause wrong result in update pipeline."
)


class NonDeterministicUpdateError(ChangelogModeError):
    """The analog of the reference's TableException under
    table.optimizer.non-deterministic-update.strategy=TRY_RESOLVE when a
    plan cannot be rewritten to satisfy determinism."""


def check_ndu(root: Node) -> None:
    """Non-deterministic update analysis (reference
    StreamNonDeterministicUpdatePlanVisitor): walk the inferred IR
    top-down carrying the set of columns whose values must be
    DETERMINISTIC for update/retract correctness. A calc node may carry
    ``nd_cols`` ({column → generating function}) and ``nd_condition``
    (function name in a filter predicate).

    Rules (visitSink/visitCalc/visitGroupAggregate et al.):
    - append sink or insert-only input: no requirement;
    - upsert sink whose PK is served by the input's upsert key: require
      determinism of the PK columns only;
    - retract sink / upsert-materialize: require ALL columns;
    - group agg over updating input retracts by complete row → ALL input
      columns must be deterministic;
    - a required column generated by a non-deterministic call, or any
      non-deterministic filter condition in an updating pipeline,
      raises the reference-shaped error."""
    if root.modify_kinds is None:
        infer(root)

    def visit(node: Node, require: frozenset) -> None:
        k = node.kind
        updating_input = any(
            c.modify_kinds != INSERT_ONLY for c in node.children
        )
        if k == "sink":
            child = node.children[0]
            if child.modify_kinds == INSERT_ONLY:
                visit(child, frozenset())
                return
            pk = frozenset(node.attrs.get("pk", ()))
            uk = child.upsert_keys
            if pk and uk is not None and len(uk) > 0 and uk <= pk:
                visit(child, pk)
            else:
                visit(child, ALL_COLUMNS)
            return
        if k in ("calc", "filter", "project"):
            nd_cols: dict = node.attrs.get("nd_cols", {})
            nd_cond = node.attrs.get("nd_condition")
            in_update_pipeline = (
                node.modify_kinds is not None
                and node.modify_kinds != INSERT_ONLY
            )
            if nd_cond and in_update_pipeline:
                raise NonDeterministicUpdateError(
                    _NDU_CONDITION_MSG.format(
                        fn=nd_cond,
                        cond=node.attrs.get("condition", "<filter>"),
                    )
                )
            if nd_cols and require:
                hit = (
                    sorted(nd_cols) if require == ALL_COLUMNS
                    else sorted(set(nd_cols) & require)
                )
                if hit:
                    cols_part = "".join(
                        f"{c}(generated by non-deterministic function: "
                        f"{nd_cols[c]} ) " for c in hit
                    )
                    raise NonDeterministicUpdateError(
                        "The column(s): " + cols_part + _NDU_COLUMN_MSG
                    )
            visit(node.children[0], require)
            return
        if k == "group_agg":
            child = node.children[0]
            if child.modify_kinds == INSERT_ONLY:
                visit(child, frozenset())
            else:
                # retract-mode agg: retracts by complete row
                visit(child, ALL_COLUMNS)
            return
        if k in ("rank", "topn", "sort_limit", "dedup", "normalize",
                 "over_agg", "sort"):
            child = node.children[0]
            visit(
                child,
                ALL_COLUMNS if child.modify_kinds != INSERT_ONLY
                else frozenset(),
            )
            return
        if k in ("join", "temporal_join", "union") or k in _INSERT_ONLY_OPS:
            for c in node.children:
                visit(
                    c,
                    ALL_COLUMNS if c.modify_kinds != INSERT_ONLY
                    else frozenset(),
                )
            return
        if k == "source":
            return
        # transparent wrappers
        for c in node.children:
            visit(c, require)

    visit(root, frozenset())
