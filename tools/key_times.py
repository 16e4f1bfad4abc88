"""Per-key wall-clock timing over the registry (optimization round 10).

Times each registry key at one scale dir through a `noop`-format write
(full computation, no sink cost — guide §1.4), after one shared warm-up.
Jobs are labelled with the key (guide §1.5) so a Spark UI / event log can
attribute stages. Output: JSON {key: seconds} ordered as run, plus load
averages so a contended run is visibly labelled (same policy as bench.py).

Usage:
  python tools/key_times.py [--sf-dir /root/testdata/sf0.1] \
      [--keys a1,b2,...] [--json /tmp/key_times.json] [--repeat 1]

Note: family-staged keys (a10-a12/n5 ZIP corpus, table-layer a19/a30+,
i16/i17 feeds) memoize staging per (process, sf_dir); the FIRST key of a
family pays the staging cost, exactly as in a driver soak. Run order is
registry order, which matches the driver's.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--keys", default="")
    ap.add_argument("--json", default="/tmp/key_times.json")
    ap.add_argument("--repeat", type=int, default=1)
    a = ap.parse_args()

    from scopus_spark import registry
    from scopus_spark.session import get_spark

    spark = get_spark(app_name="key_times")
    q = registry.all_queries()
    keys = [k.strip() for k in a.keys.split(",") if k.strip()] or list(q)
    missing = [k for k in keys if k not in q]
    if missing:
        raise SystemExit(f"unknown keys {missing}")

    def _cpu_snap() -> list[int]:
        with open("/proc/stat") as fh:
            return [int(x) for x in fh.readline().split()[1:]]

    def _steal_pct(before: list[int], after: list[int]) -> float:
        d = [y - x for x, y in zip(before, after)]
        tot = sum(d) or 1
        return round(100.0 * d[7] / tot, 1)

    load_start = os.getloadavg()[0]
    # shared warm-up so the first timed key is not charged for JIT
    q["d1"](spark, a.sf_dir).write.mode("overwrite").format("noop").save()

    times: dict[str, float] = {}
    steal: dict[str, float] = {}
    for k in keys:
        spark.sparkContext.setJobDescription(f"key_times:{k}")
        best = None
        cpu0 = _cpu_snap()
        for _ in range(a.repeat):
            t0 = time.perf_counter()
            try:
                q[k](spark, a.sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
            except Exception as e:  # record, keep going
                times[k] = -1.0
                print(f"{k}: ERROR {type(e).__name__}: {e}", flush=True)
                break
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        else:
            times[k] = round(best, 3)
            # hypervisor CPU steal over the key's window: a nonzero value
            # marks a co-tenant-contended (untrustworthy) measurement
            steal[k] = _steal_pct(cpu0, _cpu_snap())
            print(f"{k}: {times[k]}s steal={steal[k]}%", flush=True)
        spark.sparkContext.setJobDescription(None)

    payload = {
        "sf_dir": a.sf_dir,
        "times": times,
        "steal_pct": steal,
        "total": round(sum(v for v in times.values() if v > 0), 2),
        "load_start": round(load_start, 2),
        "load_end": round(os.getloadavg()[0], 2),
    }
    with open(a.json, "w") as fh:
        json.dump(payload, fh, indent=1)
    ranked = sorted(
        ((v, k) for k, v in times.items()), reverse=True
    )[:25]
    print("TOP:", ", ".join(f"{k}={v}" for v, k in ranked))
    print(f"TOTAL {payload['total']}s load {payload['load_start']}->"
          f"{payload['load_end']}")


if __name__ == "__main__":
    main()
