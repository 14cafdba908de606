"""Sinks — the reference's CSV download / SFTP put (main.py:439-458)
generalized to distributed writers with a 100 TB posture.

Layout rules that matter at scale (encoded as defaults here):
* partition by low-cardinality time/tenant keys so downstream reads
  partition-prune;
* target file sizes ~128 MB — both tiny-file floods and giant files
  hurt; AQE coalescing plus an optional repartition before write
  controls this;
* CSV exists for export parity with the reference; Parquet is the
  real interchange format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = True, single_file: bool = False) -> None:
    """CSV sink (reference K1, main.py:439-442). ``single_file``
    mirrors the reference's one-download-file shape — only for small
    exports (forces one task)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", header).csv(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_by: list[str],
                   n_buckets: int = 32, sort_by: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed (hash-clustered) table write. Two tables bucketed on
    the same key with the same bucket count join WITHOUT a shuffle —
    the amortization play for repeated large-fact joins at 100 TB:
    pay the clustering once at write time, skip the exchange on every
    subsequent join/aggregation on that key.

    Bucketing requires the table catalog (saveAsTable), not a bare
    path."""
    writer = (df.write.mode(mode)
              .bucketBy(n_buckets, *bucket_by))
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def write_partitioned(df: DataFrame, path: str,
                      partition_by: list[str],
                      mode: str = "overwrite",
                      files_per_partition: int | None = None) -> None:
    """Partitioned parquet layout: one directory level per partition
    column. ``files_per_partition`` repartitions by the partition keys
    first so each output directory gets a bounded number of files
    (avoids the 1-file-per-task flood when many tasks hold rows of
    many partitions)."""
    out = df
    if files_per_partition:
        out = df.repartition(files_per_partition, *partition_by)
    out.write.mode(mode).partitionBy(*partition_by).parquet(path)
