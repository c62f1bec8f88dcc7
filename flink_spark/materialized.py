"""Materialized tables (FLIP-435; reference
flink-sql-parser ddl/materializedtable/SqlCreateMaterializedTable.java,
SqlAlterMaterializedTableSuspend/Resume/Refresh.java, config defaults in
flink-table-api-java MaterializedTableConfigOptions.java:45-77).

Spark-first mapping: a materialized table is a parquet snapshot store plus
a refresh policy over the defining query.

- **Storage** is versioned: every refresh writes a complete new snapshot
  directory ``v=<n>`` and the registered temp view is re-pointed at it
  afterwards, so readers never observe a half-written table (the same
  snapshot-swap discipline an Iceberg/Delta commit gives on a real
  cluster; plain INSERT OVERWRITE would tear concurrent reads).
- **Refresh mode** follows the reference's derivation
  (MaterializedTableConfigOptions.java:45): an explicit ``REFRESH_MODE``
  wins; otherwise FRESHNESS below the ``freshness-threshold`` (default
  30 min) selects ``continuous``, else ``full``.
- **continuous** over a streaming defining query runs a Structured
  Streaming job into the snapshot store; over batch sources it degrades
  to a background full-recompute loop at the freshness interval — the
  honest Spark analog of Flink's workflow-scheduler-driven refresh.
- **SUSPEND / RESUME / REFRESH** map to stopping/restarting the refresh
  loop (or streaming query) and a one-shot synchronous refresh.

At 100 TB the full-refresh path is one batch job per period whose plan is
whatever Catalyst picks for the defining query (all pushdown/AQE applies);
the store itself is append-a-snapshot + atomic pointer swap, which scales
with the query, not with table history (old snapshots are pruned to the
last two).
"""

from __future__ import annotations

import re
import shutil
import tempfile
import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

#: reference default: materialized-table.refresh-mode.freshness-threshold
FRESHNESS_THRESHOLD_SEC = 30 * 60

_UNIT_SEC = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}

MT_CREATE_RE = re.compile(
    r"^\s*CREATE\s+(?:(?P<oralter>OR\s+ALTER)\s+)?"
    r"MATERIALIZED\s+TABLE\s+(?P<name>[\w.]+)\s*"
    r"(?:PARTITIONED\s+BY\s*\(\s*(?P<part>[\w,\s]+?)\s*\)\s*)?"
    r"(?:DISTRIBUTED\s+BY\s+(?:HASH\s*)?\(\s*(?P<dkeys>[\w,\s]+?)\s*\)\s+"
    r"INTO\s+(?P<dbuck>\d+)\s+BUCKETS\s*)?"
    r"(?:WITH\s*\((?P<opts>.*?)\)\s*)?"
    r"(?:FRESHNESS\s*=\s*INTERVAL\s+'(?P<fn>[\d.]+)'\s+(?P<fu>\w+)\s*)?"
    r"(?:REFRESH_MODE\s*=\s*(?P<mode>FULL|CONTINUOUS)\s*)?"
    r"AS\s+(?P<query>.+)$",
    re.IGNORECASE | re.DOTALL,
)

MT_ALTER_RE = re.compile(
    r"^\s*ALTER\s+MATERIALIZED\s+TABLE\s+(?P<name>[\w.]+)\s+"
    r"(?P<verb>SUSPEND|RESUME|REFRESH)"
    r"(?:\s+PARTITION\s*\(\s*(?P<pcol>\w+)\s*=\s*'(?P<pval>[^']*)'\s*\))?\s*$",
    re.IGNORECASE,
)

#: Extended ALTER variants (reference ddl/materializedtable/
#: SqlAlterMaterializedTableAsQuery.java, ...Freshness.java,
#: ...RefreshMode.java, ...Options.java, ...Reset.java, ...Resume.java
#: with properties).
MT_ALTER_EXT_RE = re.compile(
    r"^\s*ALTER\s+MATERIALIZED\s+TABLE\s+(?P<name>[\w.]+)\s+"
    r"(?:"
    r"(?:AS\s+(?P<q>.+))"
    r"|(?:SET\s+FRESHNESS\s*=\s*INTERVAL\s+'(?P<fn>[\d.]+)'\s+(?P<fu>\w+))"
    r"|(?:SET\s+REFRESH_MODE\s*=\s*(?P<mode>FULL|CONTINUOUS))"
    r"|(?:SET\s*\(\s*(?P<sopts>.*?)\s*\))"
    r"|(?:RESET\s*\(\s*(?P<rkeys>.*?)\s*\))"
    r"|(?:RESUME\s+WITH\s*\(\s*(?P<ropts>.*?)\s*\))"
    r"|(?:MODIFY\s+DISTRIBUTION\s+BY\s+(?:HASH\s*)?"
    r"\(\s*(?P<mdkeys>[\w,\s]+?)\s*\)\s+INTO\s+(?P<mdbuck>\d+)\s+BUCKETS)"
    r"|(?P<dropdist>DROP\s+DISTRIBUTION)"
    r")\s*$",
    re.IGNORECASE | re.DOTALL,
)

_MT_OPT_RE = re.compile(r"'(?P<k>[^']+)'\s*=\s*'(?P<v>[^']*)'")

MT_DROP_RE = re.compile(
    r"^\s*DROP\s+MATERIALIZED\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?P<name>[\w.]+)\s*$",
    re.IGNORECASE,
)


@dataclass
class MaterializedTable:
    """One materialized table: defining query + snapshot store + policy."""

    name: str
    as_query: str
    freshness_sec: float
    refresh_mode: str           # 'full' | 'continuous'
    root: str                   # storage root; snapshots live at root/v=<n>
    partition_keys: list[str] = field(default_factory=list)
    state: str = "RUNNING"      # 'RUNNING' | 'SUSPENDED'
    options: dict = field(default_factory=dict)   # WITH / SET options
    mode_explicit: bool = False  # REFRESH_MODE pinned by DDL (vs derived)
    dist_keys: list = field(default_factory=list)  # DISTRIBUTED BY keys
    dist_buckets: int | None = None
    version: int = 0
    last_refresh: float | None = None
    commits: dict = field(default_factory=dict)  # version -> commit epoch
    streaming: bool = False     # continuous mode over a streaming query
    _thread: threading.Thread | None = None
    _stop: threading.Event = field(default_factory=threading.Event)
    _lock: threading.Lock = field(default_factory=threading.Lock)
    _stream_query: object | None = None


class MaterializedTableManager:
    """Owns every materialized table of one TableEnvironment."""

    def __init__(self, spark, freshness_threshold_sec: float = FRESHNESS_THRESHOLD_SEC):
        self.spark = spark
        self.threshold = freshness_threshold_sec
        self.tables: dict[str, MaterializedTable] = {}

    # -- DDL entry points --------------------------------------------------

    def create(self, m: re.Match) -> None:
        name = m.group("name")
        if name in self.tables:
            if m.group("oralter"):
                # CREATE OR ALTER MATERIALIZED TABLE (reference
                # SqlCreateOrAlterMaterializedTable.java): existing table
                # takes the new definition in place — policy first, then
                # the defining query (AS-replacement schema rules apply);
                # snapshot history and version counter carry over.
                mt = self.tables[name]
                if m.group("fn"):
                    mt.freshness_sec = (
                        float(m.group("fn"))
                        * _UNIT_SEC[m.group("fu").lower()]
                    )
                if m.group("mode"):
                    mt.refresh_mode = m.group("mode").lower()
                    mt.mode_explicit = True
                elif m.group("fn") and not mt.mode_explicit:
                    mt.refresh_mode = (
                        "continuous" if mt.freshness_sec < self.threshold
                        else "full"
                    )
                mt.options.update(
                    {o.group("k"): o.group("v")
                     for o in _MT_OPT_RE.finditer(m.group("opts") or "")}
                )
                if m.group("dkeys"):
                    mt.dist_keys = [
                        c.strip() for c in m.group("dkeys").split(",")
                        if c.strip()
                    ]
                    mt.dist_buckets = int(m.group("dbuck"))
                self._alter_as_query(mt, m.group("query").strip())
                return None
            raise ValueError(f"materialized table {name!r} already exists")
        fn, fu = m.group("fn"), m.group("fu")
        if fn:
            freshness = float(fn) * _UNIT_SEC[fu.lower()]
        else:
            # reference defaults: 10s continuous / 30min full when omitted
            freshness = float(self.threshold)
        mode = (m.group("mode") or "").lower()
        if not mode:
            mode = "continuous" if freshness < self.threshold else "full"
        part = [c.strip() for c in (m.group("part") or "").split(",") if c.strip()]
        root = tempfile.mkdtemp(prefix=f"flink_spark_mt_{name}_")
        mt = MaterializedTable(
            name=name, as_query=m.group("query").strip(),
            freshness_sec=freshness, refresh_mode=mode, root=root,
            partition_keys=part,
            options={o.group("k"): o.group("v")
                     for o in _MT_OPT_RE.finditer(m.group("opts") or "")},
            mode_explicit=bool(m.group("mode")),
            dist_keys=[c.strip() for c in (m.group("dkeys") or "").split(",")
                       if c.strip()],
            dist_buckets=(int(m.group("dbuck"))
                          if m.group("dbuck") else None),
        )
        # probe before registering: an invalid defining query must not leave
        # a half-registered table (and leaked tempdir) behind (ADVICE r2)
        try:
            probe = self.spark.sql(mt.as_query)
        except Exception:
            shutil.rmtree(root, ignore_errors=True)
            raise
        self.tables[name] = mt
        try:
            self._finish_create(mt, probe)
        except Exception:
            del self.tables[name]
            shutil.rmtree(root, ignore_errors=True)
            raise

    def _finish_create(self, mt: MaterializedTable, probe) -> None:
        if probe.isStreaming:
            # genuinely continuous: the defining query IS a streaming
            # plan — run it as one Structured Streaming job into the
            # store (micro-batch cadence = freshness), not a recompute
            # loop. Append-only defining queries only (a parquet sink
            # constraint shared with any file-backed store).
            mt.refresh_mode = "continuous"
            mt.streaming = True
            self._start_stream(mt, probe)
            return
        # start mode default: initialize from scratch with an immediate
        # refresh, then keep it fresh (SqlStartMode.java START_FROM_SCRATCH)
        self.refresh(mt.name)
        self._start_loop(mt)

    def alter(self, m: re.Match) -> None:
        name, verb = m.group("name"), m.group("verb").upper()
        mt = self._get(name)
        if verb == "REFRESH":
            if mt.streaming:
                raise ValueError(
                    "streaming materialized table refreshes continuously; "
                    "SUSPEND/RESUME control it"
                )
            pcol = m.group("pcol")
            if pcol:
                self.refresh(name, partition=(pcol, m.group("pval")))
            else:
                self.refresh(name)
        elif verb == "SUSPEND":
            if mt.streaming:
                self._stop_stream(mt)
            else:
                self._stop_loop(mt)
            mt.state = "SUSPENDED"
        elif verb == "RESUME":
            if mt.state == "SUSPENDED":
                mt.state = "RUNNING"
                if mt.streaming:
                    self._start_stream(mt, self.spark.sql(mt.as_query))
                else:
                    self._start_loop(mt)

    def alter_extended(self, m: re.Match) -> None:
        """Extended ALTER MATERIALIZED TABLE variants (reference
        ddl/materializedtable/): AS-query replacement, SET FRESHNESS,
        SET REFRESH_MODE, SET/RESET options, RESUME WITH options."""
        name = m.group("name")
        mt = self._get(name)
        if m.group("q") is not None:
            return self._alter_as_query(mt, m.group("q").strip())
        if m.group("fn") is not None:
            unit = m.group("fu").lower()
            if unit not in _UNIT_SEC:
                raise ValueError(
                    f"SET FRESHNESS: unknown interval unit {m.group('fu')!r}"
                )
            mt.freshness_sec = float(m.group("fn")) * _UNIT_SEC[unit]
            if not mt.mode_explicit and not mt.streaming:
                # derived mode follows the freshness threshold
                # (materialized-table.refresh-mode.freshness-threshold)
                mt.refresh_mode = (
                    "continuous" if mt.freshness_sec < self.threshold
                    else "full"
                )
            self._restart_machinery(mt)
            return None
        if m.group("mode") is not None:
            if mt.streaming and m.group("mode").upper() == "FULL":
                raise ValueError(
                    "a streaming defining query refreshes continuously; "
                    "FULL refresh mode does not apply"
                )
            mt.refresh_mode = m.group("mode").lower()
            mt.mode_explicit = True
            self._restart_machinery(mt)
            return None
        if m.group("sopts") is not None:
            mt.options.update(
                {o.group("k"): o.group("v")
                 for o in _MT_OPT_RE.finditer(m.group("sopts"))}
            )
            return None
        if m.group("rkeys") is not None:
            for k in m.group("rkeys").split(","):
                mt.options.pop(k.strip().strip("'"), None)
            return None
        if m.group("mdkeys") is not None:
            # MODIFY DISTRIBUTION (SqlAlterMaterializedTableDistribution):
            # next snapshot writes under the new clustering
            mt.dist_keys = [c.strip() for c in m.group("mdkeys").split(",")
                            if c.strip()]
            mt.dist_buckets = int(m.group("mdbuck"))
            return None
        if m.group("dropdist") is not None:
            mt.dist_keys, mt.dist_buckets = [], None
            return None
        if m.group("ropts") is not None:
            # RESUME WITH ('k'='v'): apply the properties, then resume
            mt.options.update(
                {o.group("k"): o.group("v")
                 for o in _MT_OPT_RE.finditer(m.group("ropts"))}
            )
            if mt.state == "SUSPENDED":
                mt.state = "RUNNING"
                if mt.streaming:
                    self._start_stream(mt, self.spark.sql(mt.as_query))
                else:
                    self._start_loop(mt)
            return None
        raise ValueError("unrecognized ALTER MATERIALIZED TABLE form")

    def _alter_as_query(self, mt: MaterializedTable, q: str) -> None:
        """AS-query replacement (SqlAlterMaterializedTableAsQuery,
        FLIP-435): the new query must keep the existing columns as a
        schema prefix (consumers keep resolving); appended columns are
        allowed. The next snapshot materializes the new definition."""
        probe = self.spark.sql(q)
        if probe.isStreaming != mt.streaming:
            raise ValueError(
                "ALTER MATERIALIZED TABLE AS cannot switch between batch "
                "and streaming defining queries"
            )
        old_cols = [f.name for f in self.spark.table(mt.name).schema.fields]
        new_cols = [f.name for f in probe.schema.fields]
        if new_cols[: len(old_cols)] != old_cols:
            raise ValueError(
                "ALTER MATERIALIZED TABLE AS: the new query must retain "
                f"the existing columns as a prefix; table has {old_cols}, "
                f"query produces {new_cols}"
            )
        mt.as_query = q
        if mt.streaming:
            # restart the stream over the new plan (shared checkpoint is
            # per-plan: start a fresh sink dir via restart)
            self._stop_stream(mt)
            if mt.state == "RUNNING":
                self._start_stream(mt, probe)
            return None
        if mt.state == "RUNNING":
            # materialize the new definition now (snapshot continuity:
            # version bumps, previous snapshot stays time-travelable)
            self.refresh(mt.name)
        return None

    def _restart_machinery(self, mt: MaterializedTable) -> None:
        """Re-arm the refresh loop / stream after a policy change; a
        SUSPENDED table keeps its new policy for the next RESUME."""
        if mt.state != "RUNNING":
            return
        if mt.streaming:
            self._stop_stream(mt)
            self._start_stream(mt, self.spark.sql(mt.as_query))
        else:
            self._stop_loop(mt)
            self._start_loop(mt)

    def drop(self, m: re.Match) -> None:
        name = m.group("name")
        mt = self.tables.pop(name, None)
        if mt is None:
            return
        self._stop_stream(mt)
        self._stop_loop(mt)
        self.spark.catalog.dropTempView(name)
        shutil.rmtree(mt.root, ignore_errors=True)

    def shutdown(self) -> None:
        for mt in list(self.tables.values()):
            self._stop_stream(mt)
            self._stop_loop(mt)

    # -- refresh machinery -------------------------------------------------

    def refresh(self, name: str, partition: tuple[str, str] | None = None) -> None:
        """One synchronous refresh: run the defining query, write a new
        snapshot version, swap the view pointer, prune old snapshots.

        ``partition=(col, value)`` scopes the recompute (reference
        SqlAlterMaterializedTableRefresh with PARTITION): only that
        partition's rows come from the fresh query; every other row is
        carried over from the previous snapshot. (With versioned-dir
        snapshots the carry-over is a copy; a table format would swap
        partition metadata instead — same semantics.)"""
        from pyspark.sql import functions as F

        mt = self._get(name)
        with mt._lock:
            df: DataFrame = self.spark.sql(mt.as_query)
            if partition is not None:
                pcol, pval = partition
                fresh = df.filter(F.col(pcol).cast("string") == pval)
                if mt.version > 0:
                    prev = self.spark.read.parquet(f"{mt.root}/v={mt.version}")
                    carried = prev.filter(F.col(pcol).cast("string") != pval)
                    df = carried.unionByName(fresh)
                else:
                    df = fresh
            new_version = mt.version + 1
            path = f"{mt.root}/v={new_version}"
            if mt.dist_keys and mt.dist_buckets:
                # DISTRIBUTED BY (reference SqlDistribution on
                # materialized tables): cluster each snapshot by the
                # distribution key into the declared bucket count, so
                # same-keyed consumers of the snapshot read co-located
                # files (the key-clustered layout a table format keeps)
                df = df.repartition(mt.dist_buckets, *mt.dist_keys)
            writer = df.write.mode("overwrite")
            if mt.partition_keys:
                writer = writer.partitionBy(*mt.partition_keys)
            writer.parquet(path)
            self.spark.read.parquet(path).createOrReplaceTempView(mt.name)
            old = mt.version
            mt.version = new_version
            mt.last_refresh = time.time()
            mt.commits[new_version] = mt.last_refresh
            # keep current + previous snapshot (time-travel by one; matches
            # the two-snapshot retention a compacting store would default to)
            stale = old - 1
            if stale > 0:
                shutil.rmtree(f"{mt.root}/v={stale}", ignore_errors=True)

    def read_version(self, name: str, version: int | None = None,
                     as_of_ts: float | None = None) -> DataFrame:
        """Time-travel read (reference SqlSnapshot / time travel,
        `SELECT ... FOR SYSTEM_TIME AS OF` over versioned catalog tables):
        by explicit snapshot ``version``, or the newest snapshot whose
        commit time is <= ``as_of_ts``. Only versions inside the retention
        window (current + previous) are readable — a pruned version
        raises, same as an expired Iceberg/Delta snapshot."""
        mt = self._get(name)
        if version is None:
            if as_of_ts is None:
                version = mt.version
            else:
                eligible = [v for v, t in mt.commits.items() if t <= as_of_ts]
                if not eligible:
                    raise ValueError(
                        f"no snapshot of {name!r} existed at the requested time"
                    )
                version = max(eligible)
        path = f"{mt.root}/v={version}"
        import os

        if not os.path.isdir(path):
            raise ValueError(
                f"snapshot v{version} of {name!r} is outside the retention "
                f"window (available: v{max(1, mt.version - 1)}..v{mt.version})"
            )
        return self.spark.read.parquet(path)

    def _start_stream(self, mt: MaterializedTable, sdf) -> None:
        """Continuous mode over a streaming defining query: one
        Structured Streaming job appends into the store; SUSPEND stops
        it and RESUME restarts from the shared checkpoint (exactly-once
        file-sink semantics)."""
        import os

        out = f"{mt.root}/stream"
        ckpt = f"{mt.root}/ckpt"
        os.makedirs(out, exist_ok=True)
        spark = self.spark
        # until the first batch lands, the table reads as empty
        spark.createDataFrame([], sdf.schema).createOrReplaceTempView(mt.name)

        def sink(batch, batch_id: int) -> None:
            batch.write.mode("append").parquet(out)
            # re-point the view so readers see a FRESH file listing (a
            # batch parquet DataFrame caches its file index at creation)
            spark.read.schema(batch.schema).parquet(out).createOrReplaceTempView(
                mt.name
            )
            mt.version += 1
            mt.last_refresh = time.time()

        mt._stream_query = (
            sdf.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime=f"{max(mt.freshness_sec, 0.5)} seconds")
            .start()
        )

    def _stop_stream(self, mt: MaterializedTable) -> None:
        if mt._stream_query is not None:
            mt._stream_query.stop()
            mt._stream_query = None

    def _start_loop(self, mt: MaterializedTable) -> None:
        if mt._thread is not None and mt._thread.is_alive():
            return
        mt._stop.clear()

        def loop() -> None:
            while not mt._stop.wait(mt.freshness_sec):
                try:
                    self.refresh(mt.name)
                except Exception:
                    # a failed periodic refresh keeps the last good
                    # snapshot visible; the next tick retries
                    pass

        mt._thread = threading.Thread(
            target=loop, name=f"mt-refresh-{mt.name}", daemon=True
        )
        mt._thread.start()

    def _stop_loop(self, mt: MaterializedTable) -> None:
        mt._stop.set()
        if mt._thread is not None:
            mt._thread.join(timeout=10)
            mt._thread = None

    def _get(self, name: str) -> MaterializedTable:
        if name not in self.tables:
            raise ValueError(f"unknown materialized table {name!r}")
        return self.tables[name]
