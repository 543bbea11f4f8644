"""Round-13 quiet pair: `pipeline_clean_corpus` was the single r12
driver-bench mover (0.63 -> 1.25 s, 2.0x) on a path whose only r12
change was the two-line relations_index swap it does not use — the
r12 verdict asked for the standard quiet-pair closure. Controls:
`pipeline_trainset_build` (same family, shares the documents scan)
and `text_quality_funnel` (cross-family flat control over the same
corpus).

Also takes first quiet numbers for the r13 paths:
`find_hybrid_as_of_keyword_filtered` (text plane),
`find_secured_as_of` (metadata plane, new resolution),
`cdc_live_as_of_vacuumed` and `segment_autocompaction_plan`.

Protocol as the r4/r7-r12 closures: warm pass first (index builds +
snapshot sidecars), then two consecutive measured runs per query on
a quiet machine.

Run: python scripts/quiet_pair_r13.py   (expects a quiet machine)
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
    "pipeline_clean_corpus",     # the watch item
    "pipeline_trainset_build",   # same-family control
    "text_quality_funnel",       # cross-family flat control
    "find_hybrid_as_of_keyword_filtered",  # r13: text plane
    "find_secured_as_of",        # r13: metadata-plane resolution
    "cdc_live_as_of_vacuumed",   # r13: vacuum-aware serving
    "segment_autocompaction_plan",  # r13: scheduled merge plan
]


def main() -> None:
    spark = get_session("quiet-pair-r13")
    spark.range(1).count()
    qs = registry.queries()
    print("load avg:", os.getloadavg())
    for name in TARGETS:
        t0 = time.perf_counter()
        qs[name](spark, SF).collect()  # warm (index builds, caches)
        print(f"{name} cold: {round(time.perf_counter() - t0, 2)} s")
    for name in TARGETS:
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, SF).collect()
            runs.append(round(time.perf_counter() - t0, 2))
        print(f"{name}: {runs[0]} / {runs[1]} s")
    print("load avg after:", os.getloadavg())


if __name__ == "__main__":
    main()
