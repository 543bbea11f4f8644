"""Round-12 probe, second batch: the remaining new serving paths at
sf0.1 vs the 10x replica — filtered suggest (live + as-of), filtered
graph path, the catalog as-of date filter, and the vacuum report.

Claims: suggest_filtered rides the cached sidecars + one semijoin;
graph_path_filtered is one metadata filter + provenance semijoin over
the triple scan; catalog_facets_as_of_dated is the plain as-of read
plus one rid join; oplog_vacuum_report is four 1-row aggregates over
one log resolution. All should scale like their unfiltered siblings.

Run quiet:  nohup python scripts/r12_new_paths_probe.py > /tmp/np.log
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nucliadb_spark import registry
from nucliadb_spark.session import get_session

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(_ROOT, ".scale", "sf1")

TARGETS = [
    "suggest_filtered",
    "suggest_as_of_filtered",
    "suggest_paragraphs",   # unfiltered control
    "graph_path_filtered",
    "graph_path_prefix",    # unfiltered control
    "catalog_facets_as_of_dated",
    "catalog_facets_as_of",  # unfiltered control
    "oplog_vacuum_report",
]


def bench(spark, sf: str) -> dict[str, float]:
    qs = registry.queries()
    out: dict[str, float] = {}
    for name in TARGETS:
        t0 = time.perf_counter()
        qs[name](spark, sf).collect()
        print(f"  {name} cold: {round(time.perf_counter() - t0, 2)} s", flush=True)
    for name in TARGETS:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf).collect()
            runs.append(time.perf_counter() - t0)
        out[name] = round(min(runs), 2)
        print(f"  {name} warm min-of-3: {out[name]} s", flush=True)
    return out


def main() -> None:
    assert os.path.exists(os.path.join(SF1, "_DONE"))
    spark = get_session("r12-new-paths-probe")
    spark.range(1).count()
    print("load avg:", os.getloadavg())
    print("== sf0.1 ==")
    base = bench(spark, SF01)
    print("== 10x ==")
    big = bench(spark, SF1)
    print("== ratios (10x / sf0.1) ==")
    for name in TARGETS:
        print(f"  {name}: {round(big[name] / base[name], 2)}x")
    print("load avg after:", os.getloadavg())


if __name__ == "__main__":
    main()
