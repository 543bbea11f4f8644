"""Round-13 A/B probe: apply the r12 sorted-triple-index treatment
(range-partition + sortWithinPartitions BEFORE caching, so Spark's
cached-batch min/max stats prune scans) to the remaining
arrival-order sidecars the r12 verdict named:

- POSTINGS sorted by `term`: a query's term-match scan
  (post.filter(term IN terms)) should prune non-matching cached
  batches exactly like the reference's sorted term dictionary
  (tantivy's fst-ordered postings).
- IVF VECTORS sorted by `cluster_label`: the probe path's cell
  equi-scan (filter cluster_label IN probed) should prune batches
  the way nidx reads only the probed clusters' slices.

Protocol: both layouts persisted + counted (warm), then N repeated
filtered scans each, interleaved A/B to cancel drift; quiet machine
(load printed). Winners get wired into the serving sidecar builders
with a value-parity re-run (the cache stores row order only — every
consumer aggregates or orders its own output).

Run: python scripts/sorted_sidecar_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from nucliadb_spark.operators import ann, bm25
from nucliadb_spark.session import get_session
from nucliadb_spark.sources import tpch

SF = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
REPS = 7

# realistic query-term sets (the headline queries' vocab)
TERM_SETS = [
    ["spark", "shuffle", "partition"],
    ["merge", "join", "batch"],
    ["refreshed", "revision", "stream"],
    ["window", "agg", "supplier"],
]
PROBE_CELLS = [[0, 3, 7], [1, 4], [2, 5, 6], [0, 1, 2, 3]]


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def bench(label, df, scans):
    df.persist(StorageLevel.MEMORY_AND_DISK).count()  # materialize
    # warm one scan
    scans[0](df)
    runs = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for s in scans:
            s(df)
        runs.append(time.perf_counter() - t0)
    df.unpersist()
    med = sorted(runs)[len(runs) // 2]
    print(f"{label}: median {med:.3f}s  runs={[round(r,3) for r in runs]}")
    return med


def main() -> None:
    spark = get_session("sorted-sidecar-probe")
    spark.range(1).count()
    print("sf:", SF, "load avg:", os.getloadavg())

    fields = tpch.fields(spark, SF)
    post = bm25.postings(fields)

    def term_scan(terms):
        def run(df):
            df.filter(F.col("term").isin(terms)).agg(
                F.count("*"), F.sum("tf")
            ).collect()
        return run

    tscans = [term_scan(t) for t in TERM_SETS]
    a = bench("postings arrival-order", post, tscans)
    b = bench(
        "postings sorted-by-term",
        post.repartitionByRange(32, "term").sortWithinPartitions("term"),
        tscans,
    )
    print(f"postings sorted/arrival = {b / a:.2f}x")

    vectors = tpch.vectors(spark, SF)
    cents = ann.cell_centroids(vectors)
    assigned = ann.assign_cells(vectors, cents)

    def cell_scan(cells):
        def run(df):
            df.filter(F.col("cluster_label").isin(cells)).agg(
                F.count("*"), F.sum(F.element_at("vector", 1))
            ).collect()
        return run

    vscans = [cell_scan(c) for c in PROBE_CELLS]
    va = bench("vectors arrival-order", assigned, vscans)
    vb = bench(
        "vectors sorted-by-cell",
        assigned.repartitionByRange(8, "cluster_label").sortWithinPartitions(
            "cluster_label"
        ),
        vscans,
    )
    print(f"vectors sorted/arrival = {vb / va:.2f}x")
    print("load avg after:", os.getloadavg())


if __name__ == "__main__":
    main()
