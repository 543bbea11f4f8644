"""Round-12 probe: the static-metadata snapshot filters (security /
date / JSON-KV / mixed label+static) at sf0.1 vs the 10x replica.

The claim under test: a static-only tree's allowed set is ONE
column-pruned scan of the resource-metadata frame semijoined into
each leg — no label-log resolution — so it should sit at or below
the label-filtered flagship (`find_hybrid_as_of_filtered`, the r11
control) and scale exactly like it; the mixed tree adds one rid-keyed
join between the label sidecar and the static scan.

Protocol as the r6-r11 probes: warm pass (index builds + snapshot
sidecars), then min-of-3 measured runs per query, quiet machine
(load avg printed). The 10x corpus is flagship_scale_probe's
.scale/sf1 replica (built once, reused).

Run quiet:  nohup python scripts/static_filter_probe.py > /tmp/statp.log
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
    "find_secured_as_of",          # static: security
    "find_hybrid_as_of_dated",     # static: date range (3-leg)
    "find_hybrid_as_of_kv",        # static: JSON-KV typed leaves
    "find_hybrid_as_of_mixed",     # label x static joined planes
    "find_hybrid_as_of_filtered",  # r11 label-only control
    "find_hybrid_as_of",           # unfiltered flat control
]


def bench(spark, sf: str) -> dict[str, float]:
    qs = registry.queries()
    out: dict[str, float] = {}
    for name in TARGETS:
        t0 = time.perf_counter()
        qs[name](spark, sf).collect()  # warm: builds + caches sidecars
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
    assert os.path.exists(os.path.join(SF1, "_DONE")), (
        "build .scale/sf1 first (scripts/flagship_scale_probe.py)"
    )
    spark = get_session("static-filter-probe")
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
