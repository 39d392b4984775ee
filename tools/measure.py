#!/usr/bin/env python
"""Round-14 optimization measurement harness (r13 original) (guide §1).

Times individual registered queries through the noop sink (same
methodology as bench.py: one warmup, median of 3) and/or captures
.explain("formatted") to plans/r14/<query>_{before,after}.txt.

Usage:
  python tools/measure.py time q1 q2 ...        # med/min seconds each
  python tools/measure.py plan before q1 q2 ... # capture plan files
  python tools/measure.py plan after q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_wildweb_spark import registry  # noqa: E402
from etl_wildweb_spark.session import get_spark  # noqa: E402


def main() -> None:
    mode = sys.argv[1]
    if mode == "plan":
        tag, names = sys.argv[2], sys.argv[3:]
    else:
        tag, names = "", sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("r14-measure")
    out = {}
    for name in names:
        fn = registry.QUERIES[name]
        if mode == "plan":
            df = fn(spark, sf_dir)
            dest = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"), f"{name}_{tag}.txt",
            )
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            with open(dest, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
            print(f"{name}: plan -> {dest}")
            continue
        spark.sparkContext.setJobDescription(f"r14-measure: {name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        med = sorted(samples)[1]
        out[name] = (med, min(samples))
        print(f"{name}: med={med:.3f} min={min(samples):.3f}")
    if mode == "time" and out:
        print("TOTAL med", round(sum(v[0] for v in out.values()), 3))


if __name__ == "__main__":
    main()
