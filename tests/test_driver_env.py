"""Driver-session independence: the contract surface must work when the
SparkSession is built by an external driver running from a FOREIGN cwd
with no PYTHONPATH — i.e. Python workers cannot import this package by
path and rely entirely on session.prepare()'s shipping (addPyFile zip +
by-value pickling for the planner-side DataSource workers).

Runs in a subprocess because worker import resolution is decided by the
driver process's cwd/env, which pytest (cwd = repo) cannot un-see.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Same env-var convention as tests/conftest.py (ADVICE r4): prefer the
# sf0.001 sibling of the configured corpus for speed (4 worker-spawn
# queries), falling back to the configured dir itself if no sibling.
from .conftest import SF_DIR  # noqa: E402

_small = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
SF = _small if os.path.isdir(_small) else SF_DIR

_SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})   # driver-side only; workers see nothing
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.session.timeZone", "America/New_York")
             .config("spark.sql.ansi.enabled", "false")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "4")
             .getOrCreate())
    import __spark_entry__ as m
    qs = m.queries()
    sf = {sf!r}
    # one query per worker kind that historically broke:
    #   mapInPandas task worker, DataSource writer-init worker,
    #   streaming source runner, applyInPandasWithState worker,
    #   streaming DataSource writer-init worker (streamWriter path)
    for name in ("b32_ppm_decode", "b94_datasource_writer",
                 "b91_stream_http_source", "b72_stateful_sessionize",
                 "b135_stream_sink"):
        n = len(qs[name](spark, sf).collect())
        print(f"CHECK {{name}} {{n}}")
    print("ALL-OK")
    """
)


def test_contract_surface_from_foreign_cwd(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO, sf=SF)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ALL-OK" in proc.stdout, (proc.stdout[-2000:], proc.stderr[-2000:])
