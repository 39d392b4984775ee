"""Degenerate-CONTENT corpus builder — the hostile-cell twin of the
size-sensitivity sweep (both documented in .claude/skills/verify).

Plants edge-shaped rows over the sf0.001 base: empty/1-token/unicode/
identical documents, same-timestamp events, zero values, single-row
event types, digitless props, duplicate embeddings.  Round 7's run of
the full oracle suite against this corpus caught b80's ANSI-cast crash
(digitless props) that three scales of well-formed data never hit.

Usage:
    python tests/degen_corpus.py [dest_dir]          # default /tmp/degen
    SPARK_GRAFT_TEST_SF_DIR=<dest> python -m pytest tests/test_oracle.py -q
"""

from __future__ import annotations

import os
import sys

BASE = "/root/testdata/sf0.001"

_DOC_ROWS = """
    (9000, '', 'en', 'web', 0),
    (9001, 'one', 'en', 'web', 3),
    (9002, 'two tokens', 'de', 'books', 10),
    (9003, 'a b', 'fr', 'books', 3),
    (9004, 'x x x x x x x x x x x x x x x x x x x x', 'en', 'web', 39),
    (9005, 'x x x x x x x x x x x x x x x x x x x x', 'en', 'web', 39),
    (9006, 'der schnelle braune fuchs springt über den faulen hund äöü ß',
     'de', 'cc', 61),
    (9007, '数据 表 的 行 和 列 在 查询 中 被 过滤 和 排序', 'zh', 'cc', 25),
    (9008,
     'supercalifragilisticexpialidocioussupercalifragilisticexpialidocious',
     'en', 'cc', 69),
    (9009, 'a', 'en', 'web', 1),
    (9010, 'contact john.doe@example.com or a@@b at 999.999.999.999 256.1.1.1 10.0.0.1',
     'en', 'web', 75),
    (9011, 'emoji 😀😀 mixed 数据😀 tail', 'en', 'cc', 24)
"""
# 9010: PII-regex boundary cases (double-@, out-of-range octets — the
# email/IPv4 patterns run in Java regex AND RE2, same pattern string).
# 9011: astral-plane chars (UTF-16 surrogate pairs in the JVM, 4-byte
# UTF-8 in DuckDB/Arrow) through \p{L}-class tokenizers, shingling,
# split('')-based BPE, and the decode round-trip.

_EVENT_ROWS = """
    (90000, TIMESTAMP '2024-06-01 00:00:00', 9000, 'view',  0.0, '{}'),
    (90001, TIMESTAMP '2024-06-01 00:00:00', 9000, 'view',  0.0, '{}'),
    (90002, TIMESTAMP '2024-06-01 00:00:00', 9000, 'click', 0.01, '{}'),
    (90003, TIMESTAMP '2024-06-01 00:00:01', 9001, 'solo_type', 42.0, '{}'),
    (90004, TIMESTAMP '2024-06-01 00:00:02', 9002, 'pair_type', 7.0, '{}'),
    (90005, TIMESTAMP '2024-06-01 00:00:03', 9003, 'pair_type', 7.0, '{}'),
    (90006, TIMESTAMP '2024-06-01 00:00:04', 9004, 'click', 0.0000025, '{}'),
    (90007, TIMESTAMP '2024-06-01 00:00:05', 9005, 'click', -0.0000025, '{}'),
    (90008, TIMESTAMP '2024-06-01 00:00:06', 9006, 'click',
     CAST('NaN' AS DOUBLE), '{}'),
    (90009, TIMESTAMP '2024-06-01 00:00:07', 9006, 'purchase',
     CAST('Infinity' AS DOUBLE), '{}'),
    (90010, TIMESTAMP '2024-06-01 00:00:08', 9007, 'error',
     CAST('-Infinity' AS DOUBLE), '{}'),
    (90011, TIMESTAMP '2024-06-01 00:00:09', 9007, 'purchase',
     CAST('NaN' AS DOUBLE), '{}')
"""
# 90006/90007: ±2.5e-6 is an exact dyadic .5 boundary for the
# round(value*1e6) micro-unit pattern — both engines round half away
# from zero incl. negatives (probed round 8); these rows keep that
# boundary exercised corpus-wide.
# 90008-90011: non-finite metric readings (an encoder/sensor failure
# mode at 100 TB) — round(NaN*1e6)::BIGINT is a whole-query crash
# under ANSI in Spark and an INT128 conversion error in DuckDB, so
# every value-casting query quarantines them via
# functions/exact.py::finite + a mirrored isfinite(value) WHERE
# (the b80-digitless-props class for numerics, found round 8).


TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def build(dest: str, base: str = BASE) -> str:
    import duckdb

    os.makedirs(dest, exist_ok=True)
    # drop any previous build's outputs/symlinks first — a stale dest
    # from an earlier base would otherwise keep its old links and mix
    # corpora (ADVICE r7)
    for t in TABLES:
        p = os.path.join(dest, f"{t}.parquet")
        if os.path.lexists(p):
            os.remove(p)
    con = duckdb.connect()
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{base}/documents.parquet')
      UNION ALL
      SELECT * FROM (VALUES {_DOC_ROWS}) t(doc_id, text, lang, source, n_chars)
    ) TO '{dest}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{base}/events.parquet')
      UNION ALL
      SELECT * FROM (VALUES {_EVENT_ROWS})
        t(event_id, ts, user_id, event_type, value, props)
    ) TO '{dest}/events.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT * FROM read_parquet('{base}/embeddings.parquet')
      UNION ALL
      SELECT 9000 AS vec_id, embedding, label
      FROM read_parquet('{base}/embeddings.parquet') WHERE vec_id = 100
      UNION ALL
      SELECT 9001 AS vec_id, embedding, label
      FROM read_parquet('{base}/embeddings.parquet') WHERE vec_id = 100
      UNION ALL
      -- duplicate of a QUERY vector (queries are vec_id < 10): makes
      -- exact-distance ties at the top of a ranking real — cosine 1.0
      -- / L2 0.0 against the query itself — not just equidistant
      -- corpus neighbors (the vec-100 pair above).  Round 8: caught
      -- the missing [-1,1] cosine clamp DuckDB applies.
      SELECT 9002 AS vec_id, embedding, label
      FROM read_parquet('{base}/embeddings.parquet') WHERE vec_id = 3
      UNION ALL
      -- NEGATION of a query vector: the cos = -1 boundary (the clamp's
      -- other edge, well-defined in both engines — zero vectors are
      -- NOT planted here because DuckDB's builtin returns a NaN
      -- artifact there; the engine's NULL semantics for zero norms is
      -- pinned by pytest instead, see functions/vector.py::cosine)
      SELECT 9003 AS vec_id,
             list_transform(embedding, x -> CAST(-x AS FLOAT)) AS embedding,
             label
      FROM read_parquet('{base}/embeddings.parquet') WHERE vec_id = 5
    ) TO '{dest}/embeddings.parquet' (FORMAT PARQUET)
    """)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        os.symlink(f"{base}/{t}.parquet", f"{dest}/{t}.parquet")
    return dest


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/degen")
    print(f"degenerate corpus ready at {out}")
