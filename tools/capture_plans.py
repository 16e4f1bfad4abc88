"""Capture .explain("formatted") output per registry key (round-10 evidence).

Writes plans/<tag>/<key>_<suffix>.txt for each requested key. NOTE: a few
keys stage side state (ZIP corpus, versioned tables) during DataFrame
CONSTRUCTION — capturing their plan executes that staging, so capture them
on an idle box.

Usage:
  python tools/capture_plans.py --keys d2,q3,... --suffix before \
      [--sf-dir /root/testdata/sf0.1] [--tag r10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r10")
    a = ap.parse_args()

    from scopus_spark import registry
    from scopus_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    q = registry.all_queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        a.tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    for k in [s.strip() for s in a.keys.split(",") if s.strip()]:
        df = q[k](spark, a.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{k}_{a.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{k}: {path} ({len(plan)} chars, {n_ex} Exchange)")


if __name__ == "__main__":
    main()
