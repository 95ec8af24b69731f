"""SparkSession factory with the engine's required configuration.

Arrow execution must be enabled explicitly (default false in this build —
SURVEY.md §0); batch size is bounded so image-payload pandas UDFs don't blow
executor memory (UDF memory is not spill-managed, SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "lagespark",
    shuffle_partitions: int | None = None,
    arrow_batch: int = 10_000,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        # 2x cores, AQE coalesces down at runtime (SURVEY.md §4)
        cores = master[master.find("[") + 1 : master.find("]")] if "[" in master else "8"
        shuffle_partitions = 64 if cores == "*" else max(int(cores) * 2, 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("LAGESPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = ()) -> dict:
    """Load harness parquet tables (TESTDATA.md) as DataFrames."""
    names = names or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
