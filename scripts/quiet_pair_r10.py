"""Round-10 quiet pair: the three r9 driver-bench movers on
UNTOUCHED code, all above the round's 1.25x uniform inflation band
(hydrate_multi_field 1.90x, kb_feedback_report 1.84x,
find_hybrid_ivf 1.60x — none of their files changed in r9, family
probes flat). Protocol as the r4/r7/r8/r9 closures: two consecutive
measured runs per query on a quiet machine, warm session,
`find_hybrid` (flat all round) as the in-band control.

Run: python scripts/quiet_pair_r10.py   (expects a quiet machine)
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
    "kb_feedback_report",
    "find_hybrid_ivf",
    "find_hybrid",  # control
]


def main() -> None:
    spark = get_session("quiet-pair-r10")
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
