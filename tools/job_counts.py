"""Count Spark jobs per registry key — load-independent plan evidence.

Wall-clock on this box swings with co-tenant steal; the number of Spark
jobs a key schedules does not. Used in r10 to evidence the commit-path
job-count reduction (manifest stats from footers, driver-side footer
reads below the file-count threshold).

Usage: python tools/job_counts.py --keys a29,a34,a39,i15 [--sf sf0.01]
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
    ap.add_argument("--keys", required=True)
    ap.add_argument("--sf", default="sf0.01")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sf_dir = f"/root/testdata/{args.sf}"
    from scopus_spark.session import get_spark

    spark = get_spark("job_counts")
    sc = spark.sparkContext

    def njobs() -> int:
        return sc._jsc.sc().dagScheduler().nextJobId()

    from scopus_spark.registry import all_queries

    qs = all_queries()
    out: dict[str, dict] = {}
    for key in args.keys.split(","):
        key = key.strip()
        fn = qs[key]
        sc.setJobDescription(f"job_counts:{key}")
        j0, t0 = njobs(), time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[key] = {"jobs": njobs() - j0, "sec": round(time.time() - t0, 2)}
        print(f"{key}: jobs={out[key]['jobs']} sec={out[key]['sec']}", flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"sf": args.sf, "keys": out}, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
