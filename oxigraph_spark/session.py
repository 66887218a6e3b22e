"""SparkSession helper with the configs this engine assumes.

Local testing runs ``local[N]``; the same settings are what we'd set on a
real cluster (AQE for runtime re-planning/skew joins, UTC session time so
timestamp semantics match the tz-less xsd:dateTime mapping).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "oxigraph-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    sp = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = b.getOrCreate()
    configure(spark)
    return spark


def configure(spark: SparkSession) -> None:
    """Runtime confs safe to (re)apply on an externally-created session
    (the driver owns the session in ``__spark_entry__``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
