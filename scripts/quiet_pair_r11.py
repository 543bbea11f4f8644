"""Round-11 quiet pair: `find_hybrid_as_of_after` was the r10 watch
item (driver bench 9.59 s vs quiet 2.47 s — a 3.9x gap, beyond the
round's uniform ~1.2x machine-load band). Two changes since: the
fused as-of ranking is now session-cached (cached_df) so the cursor
derivation and page filter share one evaluation, and this pair
measures it against `find_hybrid_as_of` — the same-family control
that shares every as-of sidecar — plus `find_hybrid` as the
cross-family flat control.

Protocol as the r4/r7-r10 closures: warm pass first (index builds +
snapshot sidecars), then two consecutive measured runs per query on
a quiet machine.

Run: python scripts/quiet_pair_r11.py   (expects a quiet machine)
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
    "find_hybrid_as_of_after",  # the watch item (now cached-ranking)
    "find_hybrid_as_of",        # same-family control (shared sidecars)
    "find_hybrid_as_of_filtered",  # new this round — first quiet numbers
    "find_hybrid",              # cross-family flat control
]


def main() -> None:
    spark = get_session("quiet-pair-r11")
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
