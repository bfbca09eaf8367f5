"""Pre-warmed PySpark worker daemon (``spark.python.daemon.module``).

Stock ``pyspark.daemon`` forks a worker per task; each forked child then
imports numpy/pandas/pyarrow and this engine's geometry modules inside the
UDF deserializer — ~0.3-1 s per worker, multiplied by every ArrowEvalPython
node × every task slot and amplified by CPU contention when 32 workers all
import simultaneously.  On short interactive queries that boot cost
dominates the whole job (observed: >60 % of a spatial-join's wall time).

This module performs those imports ONCE in the daemon process *before* it
starts forking; children inherit the warm ``sys.modules`` via
copy-on-write, so worker initialization drops to the fork cost (~10 ms).
The daemon protocol itself is unchanged — after the imports it delegates to
``pyspark.daemon.manager`` (which already resolves the worker entry point
from ``sys.argv`` at import time).

Enable with ``spark.python.daemon.module=dataclod_spark.warm_daemon``
(set at SparkContext creation; EngineSession and bench.py do).
"""

# Heavy third-party modules every pandas UDF deserialization pulls in.
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

# pyspark.daemon must be imported AFTER sys.argv is what the factory passed
# (it resolves the worker module at import time) — but that is true here:
# this module IS the launch target, so argv is untouched.
import pyspark.daemon  # noqa: E402
import pyspark.sql.pandas.serializers  # noqa: F401  (Arrow batch codecs)

try:  # engine modules used by the spatial refine / bbox / ST_* UDFs
    from dataclod_spark.geo import algos  # noqa: F401
    from dataclod_spark.geo import concave  # noqa: F401
    from dataclod_spark.geo import core  # noqa: F401
    from dataclod_spark.geo import mvt  # noqa: F401
    from dataclod_spark.geo import overlay  # noqa: F401
    from dataclod_spark.geo import predicates  # noqa: F401
    from dataclod_spark.geo import proj  # noqa: F401
except Exception:  # pragma: no cover - engine not importable in this env
    pass

if __name__ == "__main__":
    pyspark.daemon.manager()
