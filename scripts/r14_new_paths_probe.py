"""Round-14 probe: the new serving paths at sf0.1 vs the 10x replica.

Claims under test:
- find_hybrid_as_of_vacuumed: WARM, the flagship served from cached
  snapshot sidecars — should sit ON find_hybrid_as_of's slope (the
  vacuum/purge is a one-time maintenance pass billed to the cold
  run; the physical-substrate cost model itself is the r13
  vacuum_serving_probe's result: FLAT as history grows).
- cdc_fielded_search_served_compacted: steady-state reads the cached
  alive-masked postings — should sit ON cdc_fielded_search_served.
- find_hybrid_as_of_modified_range: the derived plane is one more
  rid-keyed max_by over the SAME physical content log the keyword
  corpus reads (cached per snapshot) — should scale like the text
  plane sibling find_hybrid_as_of_keyword_filtered (same mid-wave
  cut, so they share snapshot sidecars).
- graph_path_filtered_as_of: three as-of states (relations + labels
  + meta, all cached) + one provenance semijoin — should scale like
  the live graph_path_filtered plus the states' resolution slope.

Run quiet: nohup python scripts/r14_new_paths_probe.py > /tmp/np14.log
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
    "find_hybrid_as_of",          # control: unfiltered snapshot flagship
    "find_hybrid_as_of_vacuumed",
    "cdc_fielded_search_served",  # control: uncompacted sink serve
    "cdc_fielded_search_served_compacted",
    "find_hybrid_as_of_keyword_filtered",  # control: text-plane sibling
    "find_hybrid_as_of_modified_range",
    "graph_path_filtered",        # control: live filtered graph
    "graph_path_filtered_as_of",
]


def main() -> None:
    spark = get_session("r14-new-paths-probe")
    spark.range(1).count()
    qs = registry.queries()
    print("load avg:", os.getloadavg(), flush=True)
    for sf_name, sf in (("sf0.1", SF01), ("10x", SF1)):
        if not os.path.exists(sf):
            print(f"{sf_name}: fixture missing at {sf}", flush=True)
            continue
        for name in TARGETS:
            t0 = time.perf_counter()
            qs[name](spark, sf).collect()  # cold/warm-up
            cold = round(time.perf_counter() - t0, 2)
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                qs[name](spark, sf).collect()
                runs.append(round(time.perf_counter() - t0, 2))
            print(
                f"{sf_name} {name}: cold {cold} s, warm min {min(runs)} s"
                f" (runs {runs})",
                flush=True,
            )
    print("load avg after:", os.getloadavg(), flush=True)


if __name__ == "__main__":
    main()
