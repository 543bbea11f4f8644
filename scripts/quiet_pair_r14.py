"""Round-14 quiet pairs: the five small-absolute r13 driver-bench
upticks the verdict asked to close (`bm25_prefiltered` 1.35x — the
only one adjacent to the r13 sorted-postings change — plus
`dedup_minhash_lsh`, `batch_knn_ivf`, `knn_prefiltered`,
`graph_path_prefix`), the builder's two open watch items
(`find_hybrid_as_of_rephrased` embed-sidecar variance,
`ivf_drift_plan_sampled` seeded-sample shuffle placement), and first
quiet numbers for the r14 paths (vacuumed-substrate flagship,
compacted-sink serve, derived plane, filtered graph at a snapshot).

Controls: `bm25_keyword` (the sorted-postings sibling that IMPROVED
0.81x in r13 — if bm25_prefiltered regressed from that change, the
control should still read low) and `find_hybrid_as_of` (the flagship
the three new as-of paths should sit near).

Protocol as the r4/r7-r13 closures: warm pass first (index builds +
snapshot sidecars + the one-time physical-substrate materialization),
then two consecutive measured runs per query on a quiet machine.

Run: python scripts/quiet_pair_r14.py   (expects a quiet machine)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nucliadb_spark import registry
from nucliadb_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGETS = [
    # the five r13 driver upticks
    "bm25_prefiltered",
    "bm25_keyword",              # sorted-postings control (improved in r13)
    "dedup_minhash_lsh",
    "batch_knn_ivf",
    "knn_prefiltered",
    "graph_path_prefix",
    # the builder's two open watch items
    "find_hybrid_as_of_rephrased",
    "ivf_drift_plan_sampled",
    # r14 paths (first quiet numbers) + their flagship control
    "find_hybrid_as_of",
    "find_hybrid_as_of_vacuumed",
    "cdc_fielded_search_served_compacted",
    "find_hybrid_as_of_modified_range",
    "graph_path_filtered_as_of",
]


def main() -> None:
    spark = get_session("quiet-pair-r14")
    spark.range(1).count()
    qs = registry.queries()
    print("load avg:", os.getloadavg())
    for name in TARGETS:
        t0 = time.perf_counter()
        qs[name](spark, SF).collect()  # warm (index builds, caches)
        print(f"{name} cold: {round(time.perf_counter() - t0, 2)} s", flush=True)
    for name in TARGETS:
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, SF).collect()
            runs.append(round(time.perf_counter() - t0, 2))
        print(f"{name}: {runs[0]} / {runs[1]} s", flush=True)
    print("load avg after:", os.getloadavg())


if __name__ == "__main__":
    main()
