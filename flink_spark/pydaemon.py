"""Custom PySpark worker daemon: preload heavy libraries before forking.

Python workers are forked from one daemon process per executor; everything
imported HERE is inherited by every forked worker copy-on-write, so the
worker-side ``import pandas/pyarrow/numpy`` (multi-second on sandboxed
filesystems, and paid per spawned worker) happens once per executor
instead. This matters doubly for stateful streaming (applyInPandasWithState
/ transformWithState): those runners do not return their workers to the
reuse pool, so every streaming query run used to pay the full import cost
for a fresh set of workers — guide §4.5's once-per-task discipline taken to
the process level.

Behavior is otherwise identical to ``pyspark.daemon``: enabled via
``spark.python.daemon.module=flink_spark.pydaemon`` (session.get_spark sets
it, plus PYTHONPATH so the executor-launched daemon can import this
module). Preloading is best-effort — a missing library must never break
worker startup.
"""

try:  # best-effort: never fail the daemon over a preload
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyspark.worker  # noqa: F401  (the worker module + its dep tree)
    from pyspark.sql.pandas import serializers  # noqa: F401
except Exception:  # pragma: no cover
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
