"""Table source: Iceberg when available, plain parquet otherwise.

The production target is a 10^12-row Iceberg table of Common-Crawl-style
pages (BASELINE.json input_hint).  This sandbox has no Iceberg runtime
jars, so ``read_pages`` probes for the Iceberg data source and falls
back to a parquet directory with the same schema — the rest of the
engine is source-agnostic (everything downstream sees a DataFrame).

At 100 TB the Iceberg path matters for: partition pruning on
``warc_ts`` / host-bucket partitioning of the table, snapshot isolation
while a long job runs, and metadata-only planning of the scan.  The
read options below express that intent even though the local fallback
ignores them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_pages(
    spark: SparkSession,
    path_or_table: str,
    *,
    snapshot_id: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Read the pages table from Iceberg (``catalog.db.table``) or a
    parquet path.  Column pruning is passed through either way."""
    if iceberg_available(spark) and not path_or_table.startswith(("/", "file:", "s3:")):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        df = reader.load(path_or_table)
    else:
        df = spark.read.parquet(path_or_table)
    if columns:
        df = df.select(*columns)
    return df
