"""CEP / MATCH_RECOGNIZE: pattern matching over keyed event sequences.

Reference semantics (SURVEY §2.11): Flink's CEP library and SQL
MATCH_RECOGNIZE (reference flink-libraries/flink-cep/.../cep/CEP.java,
pattern/Pattern.java, nfa/NFA.java:76, operator/CepOperator.java:83; SQL
surface StreamExecMatch.java:61). Supported here:

  - pattern sequence of named steps with per-step predicates,
  - quantifiers: once / optional / oneOrMore / zeroOrMore (greedy or
    reluctant, as in Pattern.oneOrMore().greedy() — reference
    pattern/Quantifier.java),
  - contiguity: strict (``next``) or relaxed (``followedBy``) per step,
  - ``within`` — max first-to-last event time span (Pattern.within),
  - after-match skip: PAST_LAST_ROW (default, as Flink SQL) or TO_NEXT_ROW
    (reference AfterMatchSkipStrategy).

Spark-first lowering: Flink runs a per-key NFA with a shared buffer inside
a keyed operator. The equivalent Spark shape is ``groupBy(key).
applyInPandas`` — one Arrow batch per key, rows sorted by event time, and
a backtracking matcher (equivalent to the NFA for these quantifiers; the
shared-buffer machinery exists to deduplicate state under *streaming*
incremental evaluation, which batch evaluation doesn't need). Parallelism
is across keys — the same distribution Flink has; per-key evaluation is
inherently sequential in both systems.

Output is the matched-events relation in long format: (key, match_id,
var, seq_no, <event columns>) — one row per matched event, from which
ONE ROW PER MATCH measures are plain aggregations (the decomposition
Flink's MATCH_RECOGNIZE MEASURES clause compiles to).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

SKIP_PAST_LAST_ROW = "past_last_row"
SKIP_TO_NEXT_ROW = "to_next_row"
#: parameterized strategies take the pattern variable: ("to_first", "A")
SKIP_TO_FIRST = "to_first"
SKIP_TO_LAST = "to_last"


@dataclass
class Step:
    """One pattern position. ``alts`` carries the alternation branches
    (reference Calcite SqlMatchRecognize PATTERN ``(A|B)``): a row matches
    the step if any branch predicate accepts it, and the *first* accepting
    branch (declaration order) names the matched variable — Calcite's
    deterministic alternation preference."""

    name: str
    where: Callable | None = None  # row(dict) -> bool (single-var steps)
    quantifier: str = "once"  # once|optional|oneOrMore|zeroOrMore|times
    greedy: bool = True
    strict: bool = True  # strict contiguity to the PREVIOUS step (next vs followedBy)
    alts: list | None = None  # [(var_name, predicate)] alternation branches
    min_times: int = 0  # for quantifier == "times" (A{n,m}; Pattern.times)
    max_times: int | None = None  # None = unbounded ({n,})

    def __post_init__(self):
        if self.alts is None:
            self.alts = [(self.name, self.where or (lambda row: True))]

    def match_var(self, row) -> str | None:
        """Name of the first alternation branch accepting ``row``."""
        for nm, wh in self.alts:
            if wh(row):
                return nm
        return None


@dataclass
class Pattern:
    """Builder mirroring Flink's Pattern API (begin/next/followedBy +
    quantifier modifiers, times(n,m) — reference pattern/Pattern.java
    ``times(int from, int to)``, Quantifier.java)."""

    steps: list[Step] = field(default_factory=list)
    within_span: str | None = None

    @staticmethod
    def begin(name: str, where: Callable) -> "Pattern":
        return Pattern(steps=[Step(name, where, strict=True)])

    @staticmethod
    def begin_any(alts: list) -> "Pattern":
        return Pattern(steps=[Step(alts[0][0], strict=True, alts=list(alts))])

    def next(self, name: str, where: Callable) -> "Pattern":
        self.steps.append(Step(name, where, strict=True))
        return self

    def next_any(self, alts: list) -> "Pattern":
        """Strictly-contiguous alternation step: ``(A|B)`` in PATTERN."""
        self.steps.append(Step(alts[0][0], strict=True, alts=list(alts)))
        return self

    def followed_by(self, name: str, where: Callable) -> "Pattern":
        self.steps.append(Step(name, where, strict=False))
        return self

    def one_or_more(self, greedy: bool = True) -> "Pattern":
        self.steps[-1].quantifier = "oneOrMore"
        self.steps[-1].greedy = greedy
        return self

    def zero_or_more(self, greedy: bool = True) -> "Pattern":
        self.steps[-1].quantifier = "zeroOrMore"
        self.steps[-1].greedy = greedy
        return self

    def optional(self) -> "Pattern":
        self.steps[-1].quantifier = "optional"
        return self

    def times(self, n: int, m: int | None = -1, greedy: bool = True) -> "Pattern":
        """A{n}, A{n,m}, A{n,} (m=None) — reference Pattern.times(from,to).
        Default m=-1 means "exactly n"."""
        self.steps[-1].quantifier = "times"
        self.steps[-1].min_times = n
        self.steps[-1].max_times = n if m == -1 else m
        self.steps[-1].greedy = greedy
        return self

    def not_next(self, name: str, where: Callable) -> "Pattern":
        """Negative strict step (reference pattern/Pattern.java:306
        ``notNext``, NOT-state compilation in nfa/compiler/NFACompiler.java):
        the event immediately after the previous step's match must NOT
        satisfy ``where``. Consumes no rows."""
        self.steps.append(Step(name, where, quantifier="not_next", strict=True))
        return self

    def not_followed_by(self, name: str, where: Callable) -> "Pattern":
        """Negative relaxed step (reference Pattern.java:336
        ``notFollowedBy``): no event satisfying ``where`` may occur between
        the previous step's match and the next step's match. As the LAST
        step it is the timeout pattern — the match holds only if no such
        event arrives within the ``within`` window (the reference rejects a
        trailing notFollowedBy without a window; so does this engine)."""
        self.steps.append(
            Step(name, where, quantifier="not_followed_by", strict=False)
        )
        return self

    def within(self, span: str) -> "Pattern":
        self.within_span = span
        return self


def _span_to_timedelta(span: str):
    import pandas as pd

    return pd.Timedelta(span)


def _match_from(rows, steps, start, within_td, ts_col):
    """Backtracking matcher: try to match the step list beginning at
    ``start``. Returns list of (row_index, var_name) or None.

    Equivalent to Flink's NFA for this quantifier set: each Step compiles
    to a take/ignore state; greedy vs reluctant decides the branch order;
    alternation branches dispatch per row (first accepting branch wins).
    The match is anchored: its first consumed row must be ``start`` (the
    outer scan supplies later anchors itself).
    """
    n = len(rows)
    if start >= n:
        return None
    t0 = rows[start][ts_col]

    def in_window(i):
        return within_td is None or rows[i][ts_col] - t0 <= within_td

    def rec(step_idx, pos, acc, forbidden=()):
        if step_idx == len(steps):
            return acc if acc else None  # SQL forbids empty matches
        st = steps[step_idx]
        if st.quantifier == "not_next":
            # notNext: the immediate next event must not match; consumes
            # nothing (reference NFACompiler NOT-states)
            if pos < n and in_window(pos) and st.match_var(rows[pos]) is not None:
                return None
            return rec(step_idx + 1, pos, acc, forbidden)
        if st.quantifier == "not_followed_by":
            if step_idx == len(steps) - 1:
                # trailing notFollowedBy = timeout pattern: the match holds
                # iff no matching event arrives inside the within window
                # (caller validated that within is set)
                for j in range(pos, n):
                    if not in_window(j):
                        break
                    if st.match_var(rows[j]) is not None:
                        return None
                return acc if acc else None
            # in-between notFollowedBy: forbid matching rows in the gap
            # before the next positive step's match
            return rec(step_idx + 1, pos, acc, forbidden + (st,))
        # strict (next): this step starts exactly at pos; relaxed
        # (followedBy): any number of non-matching rows may be skipped
        starts = [pos] if st.strict else list(range(pos, n + 1))
        for s in starts:
            if s > pos and any(
                fb.match_var(rows[s - 1]) is not None for fb in forbidden
            ):
                # a forbidden event sits in the gap — no later start is
                # valid either (the gap only grows)
                break
            if st.quantifier == "once":
                if s < n and in_window(s):
                    v = st.match_var(rows[s])
                    if v is not None:
                        r = rec(step_idx + 1, s + 1, acc + [(s, v)])
                        if r is not None:
                            return r
            elif st.quantifier == "optional":
                for take in ([1, 0] if st.greedy else [0, 1]):
                    if take:
                        if s < n and in_window(s):
                            v = st.match_var(rows[s])
                            if v is not None:
                                r = rec(step_idx + 1, s + 1, acc + [(s, v)])
                                if r is not None:
                                    return r
                    else:
                        # step consumed nothing — the gap (and any
                        # notFollowedBy constraint on it) continues
                        r = rec(step_idx + 1, s, acc, forbidden)
                        if r is not None:
                            return r
            else:  # oneOrMore / zeroOrMore / times: consecutive repetition
                takes = []  # [(row_index, var_name)]
                j = s
                cap = st.max_times if st.quantifier == "times" else None
                while j < n and in_window(j) and (cap is None or len(takes) < cap):
                    v = st.match_var(rows[j])
                    if v is None:
                        break
                    takes.append((j, v))
                    j += 1
                if st.quantifier == "times":
                    min_k = st.min_times
                elif st.quantifier == "zeroOrMore":
                    min_k = 0
                else:
                    min_k = 1
                ks = (
                    range(len(takes), min_k - 1, -1)
                    if st.greedy
                    else range(min_k, len(takes) + 1)
                )
                for k in ks:
                    r = rec(step_idx + 1, s + k, acc + takes[:k],
                            forbidden if k == 0 else ())
                    if r is not None:
                        return r
        return None

    r = rec(0, start, [])
    if r is not None and r[0][0] == start:
        return r
    return None


def match_pattern(
    df: DataFrame,
    pattern: "Pattern | list[Pattern]",
    key_cols: list[str],
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
    skip: str = SKIP_PAST_LAST_ROW,
) -> DataFrame:
    """Run the pattern per key over time-ordered rows; emit matched events.

    ``pattern`` may be a list of alternative patterns tried in declaration
    order at each anchor, first match wins — the expansion Calcite applies
    to ``PATTERN (PERMUTE (A, B))`` (SqlMatchRecognize): PERMUTE(A,B) ≡
    (A B | B A) with lexicographic preference.

    Output columns: key cols + (match_id, var, seq_no) + all input columns.
    ``match_id`` numbers matches per key in match order; ``seq_no`` numbers
    events within the match.
    """
    import pandas as pd

    order_cols = order_cols or [ts_col]
    variants = pattern if isinstance(pattern, list) else [pattern]
    compiled = []  # [(steps, within_td)]
    for pat in variants:
        within_td = (
            _span_to_timedelta(pat.within_span) if pat.within_span else None
        )
        steps = pat.steps
        if (
            steps
            and steps[-1].quantifier == "not_followed_by"
            and within_td is None
        ):
            # reference NFACompiler: "NotFollowedBy is not supported as a
            # last part of a Pattern without windowTime"
            raise ValueError(
                "notFollowedBy as the last pattern step requires within()"
            )
        if steps and steps[0].quantifier in ("not_next", "not_followed_by"):
            raise ValueError("a pattern cannot begin with a negative step")
        compiled.append((steps, within_td))
    in_schema = df.schema
    out_schema = StructType(
        [
            StructField("match_id", LongType(), False),
            StructField("var", StringType(), False),
            StructField("seq_no", LongType(), False),
            *in_schema.fields,
        ]
    )
    cols = in_schema.fieldNames()

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        rows = pdf.to_dict("records")
        out = []
        match_id = 0
        i = 0
        n = len(rows)
        while i < n:
            m = None
            for steps, within_td in compiled:
                m = _match_from(rows, steps, i, within_td, ts_col)
                if m is not None:
                    break
            if m is None:
                i += 1
                continue
            match_id += 1
            for seq_no, (ri, var) in enumerate(m, start=1):
                out.append(
                    {"match_id": match_id, "var": var, "seq_no": seq_no, **rows[ri]}
                )
            if skip == SKIP_PAST_LAST_ROW:
                i = max(ri for ri, _ in m) + 1
            elif skip == SKIP_TO_NEXT_ROW:
                i = i + 1
            else:
                # SKIP TO FIRST/LAST <var> (reference
                # AfterMatchSkipStrategy.skipToFirst/skipToLast): resume
                # scanning AT that element of the current match
                mode, var = skip
                var_rows = [ri for ri, v in m if v == var]
                if not var_rows:
                    raise ValueError(
                        f"AFTER MATCH SKIP TO {mode[3:].upper()} {var}: "
                        f"variable {var!r} not present in match"
                    )
                target = var_rows[0] if mode == SKIP_TO_FIRST else var_rows[-1]
                if target <= m[0][0]:
                    # the reference throws here too — resuming at the
                    # match start would loop forever
                    raise ValueError(
                        f"AFTER MATCH SKIP TO {mode[3:].upper()} {var} "
                        "does not advance past the match start"
                    )
                i = target
        if not out:
            return pd.DataFrame(columns=["match_id", "var", "seq_no", *cols])
        return pd.DataFrame(out)[["match_id", "var", "seq_no", *cols]]

    return df.groupBy(*key_cols).applyInPandas(run, schema=out_schema)
