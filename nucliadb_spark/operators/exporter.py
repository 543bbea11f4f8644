"""Training export + KB counters + clone (SURVEY §2.1 S6/S8, §2.6 A3).

- Arrow training export (ref: nucliadb_dataset/src/nucliadb_dataset/
  dataset.py:49-202 — streams partitions to .arrow files in batches
  of 1000): in Spark the scalable form is a partitioned parquet/arrow
  write; `export_arrow_stream` mirrors the reference's batch-stream
  contract (RecordBatches of ≤batch_size) via mapInArrow, writing one
  .arrow IPC-stream file per partition — executors write in parallel,
  nothing funnels through the driver.
- KB counters (ref: search/api/v1/knowledgebox.py): one-row counts of
  every engine table.
- export/import = table clone (CTAS): write + read-back identity.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, functions as F


def export_arrow_stream(df: DataFrame, path: str, batch_size: int = 1000) -> None:
    """Write each partition as an Arrow IPC stream file of
    ≤batch_size RecordBatches — executor-parallel, driver never
    materializes the data."""
    os.makedirs(path, exist_ok=True)

    def write_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        writer = None
        try:
            for batch in batches:
                for chunk_start in range(0, batch.num_rows, batch_size):
                    chunk = batch.slice(chunk_start, batch_size)
                    if writer is None:
                        pid = chunk["__pid__"][0].as_py()
                        sink = pa.OSFile(
                            os.path.join(path, f"part-{pid:05d}.arrow"), "wb"
                        )
                        writer = pa.ipc.new_stream(sink, batch.schema)
                    writer.write_batch(chunk)
        finally:
            if writer is not None:
                writer.close()
        yield from ()

    tagged = df.withColumn("__pid__", F.spark_partition_id())
    # mapInArrow is lazy; count() drives the write on the executors
    tagged.mapInArrow(write_partition, schema=tagged.schema).count()


def read_arrow_export(spark: SparkSession, path: str) -> DataFrame:
    """Read an export back (via pyarrow → createDataFrame)."""
    tables = []
    for name in sorted(os.listdir(path)):
        if name.endswith(".arrow"):
            with pa.OSFile(os.path.join(path, name), "rb") as f:
                tables.append(pa.ipc.open_stream(f).read_all())
    merged = pa.concat_tables(tables)
    return spark.createDataFrame(merged.to_pandas()).drop("__pid__")


def scan_batches(df: DataFrame, batch_size: int = 1000):
    """S5 streaming scan: full-index iterator in batches of
    batch_size (ref: nidx_text/src/reader.rs:657-716 BatchProducer,
    batch 1000). Yields lists of Rows; `toLocalIterator` streams one
    partition at a time to the driver — no full collect."""
    batch: list = []
    for row in df.toLocalIterator():
        batch.append(row)
        if len(batch) >= batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


def compact(spark: SparkSession, table_path: str, target_partitions: int = 4) -> None:
    """S4 segment-merge analog: coalesce a table's many small files
    into target_partitions (the reference log-merges tantivy segments
    — nidx/src/scheduler/log_merge.rs:59; on a lakehouse this is
    OPTIMIZE/compaction)."""
    df = spark.read.parquet(table_path)
    df.coalesce(target_partitions).write.mode("overwrite").parquet(
        table_path + ".compact"
    )


def kb_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row KB counters (A3): resources/fields/vectors/relations/
    events — mirrors the reference's counters endpoint shape."""
    from nucliadb_spark.sources import tpch

    counts = {
        "n_resources": tpch.resources(spark, sf_dir),
        "n_fields": tpch.fields(spark, sf_dir),
        "n_vectors": tpch.vectors(spark, sf_dir),
        "n_relations": tpch.relations(spark, sf_dir),
        "n_events": tpch.table(spark, sf_dir, "events"),
    }
    out = None
    for name, df in counts.items():
        one = df.agg(F.count("*").alias(name))
        out = one if out is None else out.crossJoin(one)
    return out


def kb_counters_sql() -> str:
    from nucliadb_spark.sources import tpch

    return f"""
SELECT
  (SELECT COUNT(*) FROM ({tpch.SQL_RESOURCES})) AS n_resources,
  (SELECT COUNT(*) FROM ({tpch.SQL_FIELDS})) AS n_fields,
  (SELECT COUNT(*) FROM ({tpch.SQL_VECTORS})) AS n_vectors,
  (SELECT COUNT(*) FROM ({tpch.SQL_RELATIONS}) r) AS n_relations,
  (SELECT COUNT(*) FROM events) AS n_events
"""
