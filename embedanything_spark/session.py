"""SparkSession factory with scale-appropriate defaults.

Also ships the ``embedanything_spark`` package itself to executors
(``addPyFile`` of a freshly-built zip — the same mechanism
``spark-submit --py-files`` uses on a real cluster), so pandas UDFs
deserialize on workers regardless of the driver's cwd.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Build a --py-files-able zip of the package; returns its path."""
    pkg_dir = Path(__file__).resolve().parent
    out = Path(tempfile.gettempdir()) / "embedanything_spark_pyfiles.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pkg_dir.rglob("*.py")):
            z.write(p, arcname=str(p.relative_to(pkg_dir.parent)))
    return str(out)


def get_spark(app: str = "embedanything-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra: dict[str, str] | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or \
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    b = (SparkSession.builder.appName(app).master(master)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory",
                 os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
         # spill-awareness: scan-partition size caps per-task memory in
         # the fused build pass alongside DOCS_PER_PARTITION; shrink at
         # scale if executors are memory-tight (brief: size partitions
         # to fit executor memory at the target SF)
         .config("spark.sql.files.maxPartitionBytes",
                 os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES",
                                str(128 * 1024 * 1024)))
         .config("spark.ui.enabled", "false"))
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.addPyFile(package_zip())
    return spark
