"""Round-8 quiet pair: the three r7 counter-trend bench movers
(hydrate_multi_field 1.22x, find_rephrased 1.20x, kb_feedback_report
1.19x on a round that got 11% faster overall — all in code untouched
in r7). Protocol as the r4/r7 closures: two consecutive measured runs
per query on a quiet machine, warm session, `find_hybrid` (0.99x
r7/r6, same family) as the in-band control.

Run: python scripts/quiet_pair_r8.py   (expects a quiet machine)
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
    "hydrate_multi_field",
    "find_rephrased",
    "kb_feedback_report",
    "find_hybrid",  # control
]


def main() -> None:
    spark = get_session("quiet-pair-r8")
    spark.range(1).count()
    qs = registry.queries()
    print("load avg:", os.getloadavg())
    for name in TARGETS:
        qs[name](spark, SF).collect()  # warm (index builds, caches)
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
