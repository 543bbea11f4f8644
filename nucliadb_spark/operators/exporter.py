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


# --- S8 proper: KB export / import ----------------------------------------
# The reference exports a KB as a typed item stream (resources,
# binaries, labels, learning config) to blob storage and imports it
# back (nucliadb/src/nucliadb/export_import/exporter.py:45-186,
# importer.py). The batch-first portable format is one parquet
# directory per engine table — executor-parallel on both sides, no
# driver materialization — plus a manifest for integrity checks.


def kb_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    from nucliadb_spark.sources import tpch

    return {
        "fields": tpch.fields(spark, sf_dir),
        "relations": tpch.relations(spark, sf_dir),
        "resources": tpch.resources(spark, sf_dir),
        "vectors": tpch.vectors(spark, sf_dir),
    }


def export_kb(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Write every engine table as parquet under path/<table>."""
    for name, df in kb_tables(spark, sf_dir).items():
        df.write.mode("overwrite").parquet(os.path.join(path, name))


def import_kb(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Read an exported KB back, one DataFrame per table."""
    return {
        name: spark.read.parquet(os.path.join(path, name))
        for name in sorted(os.listdir(path))
        if os.path.isdir(os.path.join(path, name))
    }


def _table_digest(name: str, df: DataFrame) -> DataFrame:
    """(table_name, n_rows, checksum): order-insensitive XOR of a
    60-bit md5 of each row's canonical scalar string (XOR never
    overflows, unlike SUM of hashes under ANSI arithmetic)."""
    from nucliadb_spark.functions.text import md5_int60

    canon = {
        "resources": F.concat_ws(
            "|",
            "rid",
            "title",
            "slug",
            F.date_format("created", "yyyy-MM-dd HH:mm:ss"),
            "status",
            F.col("hidden").cast("string"),
            F.array_join("labels", ","),
        ),
        "fields": F.concat_ws("|", "rid", "field_key", "text", "language", "source"),
        "vectors": F.concat_ws(
            "|", "rid", F.size("vector").cast("string"), "cluster_label"
        ),
        "relations": F.concat_ws(
            "|",
            "source_value",
            "relation_label",
            "target_value",
            F.coalesce("paragraph_id", F.lit("-")),
        ),
    }[name]
    return (
        df.select(md5_int60(canon).alias("h"))
        .agg(F.count("*").alias("n_rows"), F.expr("bit_xor(h)").alias("checksum"))
        .select(F.lit(name).alias("table_name"), "n_rows", "checksum")
    )


def kb_export_manifest(spark: SparkSession, sf_dir: str, path: str) -> DataFrame:
    """Export the KB, import it back, digest the IMPORTED tables —
    a green oracle row (digesting the source tables in DuckDB) proves
    the round trip is content-identical."""
    export_kb(spark, sf_dir, path)
    imported = import_kb(spark, path)
    out = None
    for name in sorted(imported):
        d = _table_digest(name, imported[name])
        out = d if out is None else out.unionByName(d)
    return out.orderBy("table_name")


def kb_export_manifest_sql() -> str:
    from nucliadb_spark.functions.text import md5_int60_sql
    from nucliadb_spark.sources import tpch

    digests = {
        "fields": (
            tpch.SQL_FIELDS,
            "concat_ws('|', rid, field_key, text, language, source)",
        ),
        "relations": (
            tpch.SQL_RELATIONS,
            "concat_ws('|', source_value, relation_label, target_value, "
            "coalesce(paragraph_id, '-'))",
        ),
        "resources": (
            tpch.SQL_RESOURCES,
            "concat_ws('|', rid, title, slug, strftime(created, '%Y-%m-%d %H:%M:%S'), "
            "status, hidden, array_to_string(labels, ','))",
        ),
        "vectors": (
            tpch.SQL_VECTORS,
            "concat_ws('|', rid, len(vector), cluster_label)",
        ),
    }
    parts = [
        f"""SELECT '{name}' AS table_name, COUNT(*) AS n_rows,
       bit_xor({md5_int60_sql(canon)}) AS checksum
FROM ({src})"""
        for name, (src, canon) in digests.items()
    ]
    return " UNION ALL ".join(parts) + " ORDER BY table_name"
