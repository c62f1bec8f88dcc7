"""Embedded workflow scheduler for materialized-table refreshes
(FLIP-448; reference flink-sql-gateway
workflow/scheduler/EmbeddedQuartzScheduler.java,
workflow/EmbeddedWorkflowScheduler.java, REST shapes
rest/header/materializedtable/scheduler/*Headers.java:
POST /workflow/embedded-scheduler/create|suspend|resume,
DELETE /workflow/embedded-scheduler/delete).

Mapping onto this engine:

- A **workflow** is a named cron schedule over one materialized table's
  refresh. Job naming follows the reference exactly
  (QuartzSchedulerUtils.getJobKey: name = ``quartz_job_<identifier>``,
  group = ``default_group``).
- The cron dialect is Quartz's 6/7-field spelling (``sec min hour dom
  mon dow [year]``) with ``* ? , - /`` supported — evaluated by a pure-
  Python next-fire computer below (no quartz on the cluster; the
  evaluator walks field-by-field, so sparse crons don't spin).
- On fire, the scheduler calls BACK through the gateway's own REST
  surface — ``POST /v1/sessions/<sh>/materialized-tables/<id>/refresh``
  with ``isPeriodic=true`` and the scheduled fire time — exactly the
  loop the reference's EmbeddedSchedulerJob runs (it opens a gateway
  session and posts the refresh endpoint). The owning session is located
  by identifier: our materialized tables live in per-session
  TableEnvironments rather than a persistent catalog (honest divergence,
  SURVEY §7.3), so the workflow follows the session that owns the table.
- SUSPEND pauses the trigger (job kept, reference pauseJob); RESUME
  re-arms it and merges any ``dynamicOptions`` into the workflow info
  (the reference deletes + recreates the job with merged options —
  state-equivalent to the in-place merge here).

Scale note: the scheduler itself is driver-side control plane — one
thread, O(#workflows) bookkeeping; every fired refresh is a full Spark
batch job whose plan/parallelism comes from the defining query.
"""

from __future__ import annotations

import calendar
import threading
import time
from dataclasses import dataclass, field

QUARTZ_JOB_PREFIX = "quartz_job"
QUARTZ_JOB_GROUP = "default_group"


# ------------------------------------------------------------- cron ----


def _parse_field(spec: str, lo: int, hi: int) -> frozenset[int] | None:
    """One cron field → allowed-value set (None = '?' = no constraint)."""
    spec = spec.strip()
    if spec == "?":
        return None
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ValueError(f"bad cron step {step_s!r}")
        if part in ("*", ""):
            lo_p, hi_p = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            lo_p, hi_p = int(a), int(b)
        else:
            lo_p = hi_p = int(part)
            if "/" in spec and step > 1:
                hi_p = hi  # `n/step` means starting at n
        if not (lo <= lo_p <= hi and lo <= hi_p <= hi):
            raise ValueError(f"cron field {spec!r} out of range [{lo},{hi}]")
        out.update(range(lo_p, hi_p + 1, step))
    return frozenset(out)


@dataclass(frozen=True)
class CronExpr:
    """Quartz cron: ``sec min hour dom mon dow [year]``. ``dow`` uses the
    Quartz convention 1=SUN..7=SAT."""

    sec: frozenset
    min: frozenset
    hour: frozenset
    dom: frozenset | None
    mon: frozenset
    dow: frozenset | None

    @classmethod
    def parse(cls, expr: str) -> "CronExpr":
        parts = expr.split()
        if len(parts) not in (6, 7):
            raise ValueError(
                f"cron expression must have 6 or 7 fields: {expr!r}"
            )
        sec = _parse_field(parts[0], 0, 59)
        mnt = _parse_field(parts[1], 0, 59)
        hr = _parse_field(parts[2], 0, 23)
        dom = _parse_field(parts[3], 1, 31)
        mon = _parse_field(parts[4], 1, 12)
        dow = _parse_field(parts[5], 1, 7)
        for name, v in (("seconds", sec), ("minutes", mnt), ("hours", hr),
                        ("months", mon)):
            if v is None:
                raise ValueError(f"'?' is only valid for day fields, not {name}")
        return cls(sec=sec, min=mnt, hour=hr, dom=dom, mon=mon, dow=dow)

    def _day_ok(self, y: int, mo: int, d: int) -> bool:
        if self.dom is not None and d not in self.dom:
            return False
        if self.dow is not None:
            # Quartz: 1=Sunday .. 7=Saturday; Python weekday(): Mon=0
            qdow = ((calendar.weekday(y, mo, d) + 1) % 7) + 1
            if qdow not in self.dow:
                return False
        return True

    def next_fire(self, after_epoch: float) -> float:
        """Smallest fire time strictly greater than ``after_epoch``
        (local time, matching Quartz's default zone behavior). Walks
        field-by-field, so sparse crons resolve in O(fields), not by
        spinning over seconds."""
        t = time.localtime(int(after_epoch) + 1)
        y, mo, d = t.tm_year, t.tm_mon, t.tm_mday
        hh, mm, ss = t.tm_hour, t.tm_min, t.tm_sec
        for _ in range(366 * 5):  # bound: five years of day-steps
            if mo not in self.mon:
                mo += 1
                if mo > 12:
                    y, mo = y + 1, 1
                d, hh, mm, ss = 1, 0, 0, 0
                continue
            if not self._day_ok(y, mo, d):
                d += 1
                if d > calendar.monthrange(y, mo)[1]:
                    d, mo = 1, mo + 1
                    if mo > 12:
                        y, mo = y + 1, 1
                hh, mm, ss = 0, 0, 0
                continue
            nh = min((h for h in self.hour if h >= hh), default=None)
            if nh is None:
                d, hh, mm, ss = d + 1, 0, 0, 0
                if d > calendar.monthrange(y, mo)[1]:
                    d, mo = 1, mo + 1
                    if mo > 12:
                        y, mo = y + 1, 1
                continue
            if nh != hh:
                hh, mm, ss = nh, 0, 0
            nm = min((m for m in self.min if m >= mm), default=None)
            if nm is None:
                hh, mm, ss = hh + 1, 0, 0
                if hh > 23:
                    d, hh = d + 1, 0
                    if d > calendar.monthrange(y, mo)[1]:
                        d, mo = 1, mo + 1
                        if mo > 12:
                            y, mo = y + 1, 1
                continue
            if nm != mm:
                mm, ss = nm, 0
            ns = min((s for s in self.sec if s >= ss), default=None)
            if ns is None:
                mm, ss = mm + 1, 0
                if mm > 59:
                    hh, mm = hh + 1, 0
                    if hh > 23:
                        d, hh = d + 1, 0
                        if d > calendar.monthrange(y, mo)[1]:
                            d, mo = 1, mo + 1
                            if mo > 12:
                                y, mo = y + 1, 1
                continue
            return time.mktime((y, mo, d, hh, mm, ns, 0, 0, -1))
        raise ValueError("cron expression never fires within five years")


# --------------------------------------------------------- scheduler ----


@dataclass
class WorkflowInfo:
    """reference workflow/WorkflowInfo.java: everything a fire needs."""

    materialized_table: str
    cron: str
    init_config: dict = field(default_factory=dict)
    execution_config: dict = field(default_factory=dict)
    rest_endpoint_url: str | None = None
    dynamic_options: dict = field(default_factory=dict)
    suspended: bool = False
    next_fire: float = 0.0
    fire_count: int = 0
    last_error: str | None = None


class SchedulerError(ValueError):
    """reference workflow/scheduler/SchedulerException.java."""


class EmbeddedWorkflowScheduler:
    """In-process cron scheduler over materialized-table refreshes; the
    Python stand-in for the reference's RAMJobStore quartz instance
    (single worker thread, exactly the reference's threadCount=1)."""

    def __init__(self, fire_refresh) -> None:
        """``fire_refresh(info: WorkflowInfo, schedule_time: str)`` runs
        one refresh; provided by the gateway (REST loopback)."""
        self.jobs: dict[tuple[str, str], WorkflowInfo] = {}
        self._fire_refresh = fire_refresh
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- REST verbs ------------------------------------------------------

    def create(self, identifier: str, cron: str, init_config=None,
               execution_config=None, rest_endpoint_url=None) -> tuple[str, str]:
        name = f"{QUARTZ_JOB_PREFIX}_{identifier}"
        key = (name, QUARTZ_JOB_GROUP)
        expr = CronExpr.parse(cron)  # validate before registering
        with self._lock:
            if key in self.jobs:
                raise SchedulerError(
                    f"Materialized table {identifier} quartz schedule job "
                    "already exist in group default_group."
                )
            info = WorkflowInfo(
                materialized_table=identifier, cron=cron,
                init_config=dict(init_config or {}),
                execution_config=dict(execution_config or {}),
                rest_endpoint_url=rest_endpoint_url,
            )
            info.next_fire = expr.next_fire(time.time())
            self.jobs[key] = info
        self._ensure_thread()
        self._wake.set()
        return key

    def _get(self, name: str, group: str) -> WorkflowInfo:
        info = self.jobs.get((name, group))
        if info is None:
            raise SchedulerError(
                f"The workflow of job name: {name}, job group: {group} "
                "does not exist."
            )
        return info

    def suspend(self, name: str, group: str) -> None:
        with self._lock:
            self._get(name, group).suspended = True

    def resume(self, name: str, group: str, dynamic_options=None) -> None:
        """Re-arm a workflow (no-op when not suspended — quartz
        resumeJob semantics); non-empty dynamic options REPLACE the
        stored ones (the reference deletes + recreates the job with the
        new options under the same key + cron)."""
        with self._lock:
            info = self._get(name, group)
            if dynamic_options:
                info.dynamic_options = dict(dynamic_options)
            if info.suspended:
                info.suspended = False
                info.next_fire = CronExpr.parse(info.cron).next_fire(
                    time.time()
                )
        self._wake.set()

    def delete(self, name: str, group: str) -> None:
        with self._lock:
            self._get(name, group)
            del self.jobs[(name, group)]
        self._wake.set()

    # -- machinery ---------------------------------------------------------

    def _ensure_thread(self) -> None:
        if self._thread is not None and self._thread.is_alive():
            return
        self._stop.clear()
        self._thread = threading.Thread(
            target=self._loop, name="embedded-workflow-scheduler", daemon=True
        )
        self._thread.start()

    def _loop(self) -> None:
        while not self._stop.is_set():
            now = time.time()
            due: list[WorkflowInfo] = []
            nxt = None
            with self._lock:
                for info in self.jobs.values():
                    if info.suspended:
                        continue
                    if info.next_fire <= now:
                        due.append(info)
                        info.next_fire = CronExpr.parse(info.cron).next_fire(
                            max(now, info.next_fire)
                        )
                    nxt = (info.next_fire if nxt is None
                           else min(nxt, info.next_fire))
            for info in due:
                stime = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime(now))
                try:
                    self._fire_refresh(info, stime)
                    info.fire_count += 1
                    info.last_error = None
                except Exception as e:  # noqa: BLE001 — a failed fire keeps
                    info.last_error = str(e)  # the schedule alive (quartz)
            timeout = 30.0 if nxt is None else max(0.05, nxt - time.time())
            self._wake.wait(timeout=min(timeout, 30.0))
            self._wake.clear()

    def shutdown(self) -> None:
        self._stop.set()
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
