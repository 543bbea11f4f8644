"""Wait for a quiet box, then run bench.py (r14 optimization close).

The box suffers CPU-STEAL waves from the hypervisor (cumulative
steal in /proc/stat is ~46% of user+system this session) that are
invisible to loadavg and process lists — the "VM noise" SCALE.md has
recorded since r11, now measurable. Gate the launch on the sampled
steal RATE (jiffies/s over a 10 s window), not loadavg, and record
the steal delta across the run so the reading can be banded.

Usage: python scripts/quiet_bench_r14.py <out.json> [steal_pct_max=2] [max_wait_s=1800]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_steal() -> tuple[float, float]:
    """(steal_jiffies, total_jiffies) from /proc/stat."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [float(x) for x in parts[1:]]
    return vals[7], sum(vals)


def steal_pct(window_s: float = 10.0) -> float:
    s0, t0 = read_steal()
    time.sleep(window_s)
    s1, t1 = read_steal()
    return 100.0 * (s1 - s0) / max(t1 - t0, 1e-9)


def main() -> None:
    out = sys.argv[1]
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    max_wait = float(sys.argv[3]) if len(sys.argv) > 3 else 1800.0
    t0 = time.time()
    while time.time() - t0 < max_wait:
        sp = steal_pct()
        if sp < thresh and os.getloadavg()[0] < 1.5:
            break
        print(f"steal {sp:.1f}%/load {os.getloadavg()[0]:.2f}, waiting...",
              flush=True)
        time.sleep(20)
    la0 = os.getloadavg()
    steal0, tot0 = read_steal()
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    print(f"launching bench at loadavg {la0}", flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env,
    )
    line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
    data = json.loads(line)
    steal1, tot1 = read_steal()
    data["loadavg_at_launch"] = la0
    data["loadavg_at_end"] = os.getloadavg()
    data["steal_pct_during_run"] = round(
        100.0 * (steal1 - steal0) / max(tot1 - tot0, 1e-9), 2
    )
    with open(out, "w") as f:
        json.dump(data, f)
    print(json.dumps({"value": data.get("value"), "la0": la0,
                      "la1": data["loadavg_at_end"],
                      "steal_pct": data["steal_pct_during_run"]}))


if __name__ == "__main__":
    main()
