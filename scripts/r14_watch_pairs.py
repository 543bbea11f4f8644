"""r14 optimization close: quiet pairs for the sweep-elevated seats.

Bench-identical session + warm-up; for each watch query run one
untimed warm pass then N timed runs. One process for the whole set
(the seats share sidecars with the bench, as in the real bench), run
on a verified-quiet box; loadavg printed before/after each query so
any episode is visible in the record.

Usage: python scripts/r14_watch_pairs.py [runs=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

WATCH = [
    "find_hybrid_as_of_mixed",
    "find_hybrid_as_of_keyword_filtered",
    "find_hybrid_as_of_entities",
    "find_hybrid_as_of_rephrased",
    "purge_deletions_plan",
    "ivf_drift_plan_incremental",
    "graph_pagerank",
    "stream_windowed_counts",
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from nucliadb_spark import registry
    from nucliadb_spark.session import get_session

    spark = get_session("watch_pairs")
    spark.range(1).count()
    for t in ["part", "documents", "embeddings", "lineitem", "orders", "events"]:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").schema
    qs = registry.queries()
    for name in WATCH:
        la0 = os.getloadavg()[0]
        qs[name](spark, SF_DIR).collect()  # warm (sidecar builds)
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).collect()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: {times} load {la0:.2f}->{os.getloadavg()[0]:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
