"""Property-based tests (SURVEY.md §5.2.3): the JS-compat helpers vs
executable Python models of the verified reference semantics.

Domain note: the models cover the *coordinate/date string domain the
WildWeb feed emits* (decimal numerics with optional sign/whitespace,
ISO-ish datetimes, and garbage).  Known out-of-domain divergences of
`try_cast` from JS `Number()` — hex literals ('0x10' → 16 in JS, NULL
in Spark) and 'NaN'/'Infinity' literals — are documented in
functions/js_compat.py and excluded: the feed's lat/lon are decimal
strings (reference task.ts:17-19 + CHANGELOG history).
"""

from __future__ import annotations

import math
from datetime import datetime, timezone

from hypothesis import given, settings, strategies as st

from etl_wildweb_spark.functions.js_compat import geo_valid, truncate_minute
from pyspark.sql import functions as F

# ---------------------------------------------------------------- geo

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)

coordish = st.one_of(
    st.just(None),
    st.just(""),
    st.just("0"),
    st.just("0.0"),
    st.just("-0.0"),
    st.text(alphabet="abcxyz,;- ", max_size=6),
    finite.map(lambda f: repr(round(f, 6))),
    finite.map(lambda f: f" {round(f, 6)} "),  # whitespace-tolerant Number()
    finite.map(lambda f: f"+{abs(round(f, 6))}"),
    st.integers(min_value=-10**9, max_value=10**9).map(str),
    finite.map(lambda f: f"{round(f, 4)}abc"),  # trailing garbage
)


def js_keeps(x: str | None) -> bool:
    """Model of task.ts:120-124 for one coordinate: keep iff
    NOT (!x || isNaN(Number(x)) || Number(x) === 0)."""
    if not x:  # JS falsy: null, '' (also drops '0' via Number()==0 anyway)
        return False
    try:
        v = float(x.strip()) if x.strip() != "" else 0.0
    except ValueError:
        return False  # NaN
    return v != 0.0 and not math.isnan(v)


@given(st.lists(coordish, min_size=1, max_size=80))
@settings(max_examples=8, deadline=None)
def test_geo_valid_matches_js_model(spark, values):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i long, x string")
    got = {
        r.i: r.keep
        for r in df.select("i", geo_valid("x").alias("keep")).collect()
    }
    for i, v in enumerate(values):
        assert bool(got[i]) == js_keeps(v), (v, got[i])


# --------------------------------------------------------------- dates

dt = st.datetimes(
    min_value=datetime(1971, 1, 1),
    max_value=datetime(2099, 12, 31),
)

datish = st.one_of(
    dt.map(lambda d: d.strftime("%Y-%m-%d %H:%M:%S")),
    dt.map(lambda d: d.strftime("%Y-%m-%dT%H:%M:%S")),
    dt.map(lambda d: d.strftime("%Y-%m-%d %H:%M:%S.%f")),
    st.just("n/a"),
    st.just(""),
    st.just("13/13/2020"),
    st.text(alphabet="0123456789-: ", max_size=10),
)


def js_truncated(x: str) -> str | None:
    """Model of task.ts:118 for feed-domain strings: parse, zero out
    sec/ms, print UTC 'yyyy-MM-dd HH:mm'; unparsable → None (the
    engine's error-channel decision, SURVEY.md §2.1.4)."""
    s = x.replace("T", " ")
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M"):
        try:
            d = datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
            return d.strftime("%Y-%m-%d %H:%M")
        except ValueError:
            continue
    return None


@given(st.lists(datish, min_size=1, max_size=60))
@settings(max_examples=8, deadline=None)
def test_truncate_minute_matches_model(spark, values):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "i long, d string"
    )
    got = {
        r.i: r.out
        for r in df.select("i", truncate_minute("d").alias("out")).collect()
    }
    for i, v in enumerate(values):
        want = js_truncated(v)
        # try_to_timestamp may accept formats the strict model rejects
        # (e.g. 'yyyy-MM-dd' alone); only compare when the model parsed
        # OR Spark also rejected — asymmetric acceptance means the value
        # is outside the feed's datetime domain
        if want is not None or got[i] is None:
            assert got[i] == want, (v, got[i], want)

# ------------------------------------------------ BPE decode inverse

# any space-free strings work as words AND merge symbols: BPE merging
# only ever removes separator spaces, so decode (= concatenate tokens,
# strip the </w> marker) inverts encode for ANY merge table, valid or
# not — the invariant b176 rides on.  Spaces are excluded because the
# word/symbol domain is the output of split-on-' ' by construction.
_no_space = st.text(min_size=1, max_size=10).filter(lambda s: " " not in s)
_sym = st.text(min_size=1, max_size=3).filter(lambda s: " " not in s)


@given(
    st.lists(_no_space, min_size=1, max_size=15, unique=True),
    st.lists(st.tuples(_sym, _sym), max_size=10),
)
@settings(max_examples=6, deadline=None)
def test_bpe_decode_inverts_encode_any_table(spark, words, merges):
    """decode∘encode ≡ identity for arbitrary unicode words (incl.
    astral-plane chars, which Java's split('') halves into surrogate
    pairs and decode must reassemble) under an ARBITRARY merge table,
    on BOTH encoder paths — the corpus-independent generalization of
    b176's oracle and the hostile-word pin in test_llmops.py."""
    from etl_wildweb_spark.operators import text as T

    df = spark.createDataFrame([(w,) for w in words], "w string")
    for enc in (
        T.bpe_encode_expr(F.col("w"), merges),
        T.bpe_encode_udf(merges)(F.col("w")),
    ):
        got = {
            r.w: r.dw
            for r in df.select("w", T.bpe_decode_expr(enc).alias("dw")).collect()
        }
        assert got == {w: w for w in words}
