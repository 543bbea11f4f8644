"""Round-9 quiet pair: the two r8 fielded-flagship driver outliers
(find_hybrid_fielded_graph: driver 5.87 s vs r8 quiet 2.4-2.5 s, a
2.3x gap where the documented driver-load band is ~1.2-1.3x;
find_hybrid_fielded: 1.34x driver move on untouched code). Protocol
as the r4/r7/r8 closures: two consecutive measured runs per query on
a quiet machine, warm session, `find_hybrid` (same family, flat all
round) as the in-band control.

Run: python scripts/quiet_pair_r9.py   (expects a quiet machine)
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
    "find_hybrid_fielded_graph",
    "find_hybrid_fielded",
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
