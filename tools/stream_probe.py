#!/usr/bin/env python
"""Round-14 streaming fixed-cost probe (guide §1 measure first): run one
of the stream-stream join queries and dump the per-micro-batch
durationMs breakdown from the engine's own progress events, so the
optimization targets the measured cost (state commits vs planning vs
addBatch vs offset WAL), not a guess.

  python tools/stream_probe.py b180_stream_stream_full_outer
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_wildweb_spark import registry  # noqa: E402
from etl_wildweb_spark.session import get_spark  # noqa: E402

# capture every streaming query's progress via the listener API
from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402


class _Capture(StreamingQueryListener):
    progress: list = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        _Capture.progress.append(json.loads(event.progress.json))

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("r14-stream-probe")
    spark.streams.addListener(_Capture())
    fn = registry.QUERIES[name]
    # warmup
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    _Capture.progress.clear()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    time.sleep(1)  # let the listener drain
    print(f"\n== {name}: wall {wall:.2f}s, {len(_Capture.progress)} progress events ==")
    for p in _Capture.progress:
        d = p.get("durationMs", {})
        print(
            f"batch {p.get('batchId')}: rows={p.get('numInputRows')} "
            f"triggerExecution={d.get('triggerExecution')} "
            f"addBatch={d.get('addBatch')} getBatch={d.get('getBatch')} "
            f"latestOffset={d.get('latestOffset')} "
            f"queryPlanning={d.get('queryPlanning')} "
            f"walCommit={d.get('walCommit')} "
            f"commitOffsets={d.get('commitOffsets')} "
            f"commitBatch={d.get('commitBatch')}"
        )
        for so in p.get("stateOperators", []):
            print(
                f"  state: commitTimeMs~{so.get('allUpdatesTimeMs')}+"
                f"{so.get('commitTimeMs')} rowsTotal={so.get('numRowsTotal')} "
                f"shufflePartitions={so.get('numShufflePartitions')} "
                f"stateStoreInstances={so.get('numStateStoreInstances')}"
            )


if __name__ == "__main__":
    main()
