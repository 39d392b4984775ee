"""The WildWeb CAD ingest dataflow, re-expressed as composable DataFrame
stages (SURVEY.md §2 Part A, operators A5-A17).

Reference: /root/reference/task.ts (165 lines, TypeScript Lambda).  The
semantics reproduced here — including the JS-truthiness geo filter, the
moment-leniency of the time filter, and the in-place date mutation that
propagates into ``metadata.date`` — are the *verified* behavior tables
in SURVEY.md §A9-A11/§2.1.  Documented divergences (§2.1 decisions):

  * an unparsable envelope becomes an error-channel row instead of
    silently aborting the whole run (task.ts:96 ``return`` quirk);
  * incidents whose date cannot be parsed are routed to the error
    channel instead of emitting an 'Invalid date' feature (task.ts:118).

Every stage is a narrow transformation (no shuffle anywhere in this
pipeline — it is embarrassingly parallel per incident), so at 100 TB the
whole flow is a single whole-stage-codegen pass over the source
partitions; throughput is bounded by scan + JSON parse only.
"""

from __future__ import annotations

import functools
from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.js_compat import geo_valid, js_number, truncate_minute
from ..registry import query

# ------------------------------------------------------------------ schemas

#: WildCadIncident (task.ts:7-24): 15 fields, numerics-as-strings
#: (load-bearing — SURVEY.md §1.2).  ``resources`` is Any[] in the
#: reference (task.ts:20) and CHANGELOG.md:88 mandates full-fidelity
#: pass-through, so it is typed VARIANT: objects stay objects, numbers
#: stay numbers, and the submit sink's to_json re-emits the original
#: JSON values instead of double-encoding them as escaped strings
#: (ADVICE round 1; golden test: test_resources_raw_json_fragments).
INCIDENT_FIELDS = [
    "ic", "date", "name", "type", "uuid", "acres", "fuels", "inc_num",
    "fire_num", "latitude", "location", "longitude", "resources",
    "webComment", "fire_status", "fiscal_data",
]

INCIDENT_SCHEMA = T.StructType(
    [
        T.StructField(f, T.VariantType() if f == "resources" else T.StringType())
        for f in INCIDENT_FIELDS
    ]
)

#: API envelope (task.ts:88-91): Array<{retrieved, data: incidents|null}>
ENVELOPE_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("retrieved", T.StringType()),
            T.StructField("data", T.ArrayType(INCIDENT_SCHEMA)),
        ]
    )
)

#: The four IncidentRange options (task.ts:27-35) → Spark interval text.
#: task.ts:110-114: parseInt(range.split(' ')[0]) + (Hours→hours else week).
INCIDENT_RANGES = {
    "24 Hours": "24 hours",
    "48 Hours": "48 hours",
    "72 Hours": "72 hours",
    "1 Week": "7 days",
}

ERROR_SCHEMA = T.StructType(
    [
        T.StructField("center", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("reason", T.StringType()),
        T.StructField("payload", T.StringType()),
    ]
)


# ------------------------------------------------------------------- stages

def parse_envelope(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """A5: typed JSON decode of the per-center HTTP response body
    (task.ts:88-91).  PERMISSIVE: unparsable payloads surface as a NULL
    envelope and are routed to the error channel by validate_envelopes
    (the reference throws; divergence documented in module docstring)."""
    return raw.withColumn("envelope", F.from_json(F.col(payload_col), ENVELOPE_SCHEMA))


def validate_envelopes(env: DataFrame) -> tuple[DataFrame, DataFrame]:
    """A6/A7 + HTTP status check: split envelopes into (ok, errors).

    ok rows carry (center, retrieved, data); error rows record the stage
    that rejected them.  task.ts semantics: non-OK HTTP → error
    (task.ts:84-86); envelope length ≠ 1 → reference silently aborts the
    run (task.ts:93-97) — here it is an error row; data === null → zero
    incidents, run continues (task.ts:99-104)."""
    http_err = (
        env.filter(~F.col("http_ok"))
        .select(
            "center",
            F.lit("fetch").alias("stage"),
            F.lit("http_not_ok").alias("reason"),
            F.col("payload").alias("payload"),
        )
    )
    ok_http = env.filter(F.col("http_ok"))
    parse_err = (
        ok_http.filter(F.col("envelope").isNull())
        .select(
            "center",
            F.lit("decode").alias("stage"),
            F.lit("invalid_json").alias("reason"),
            F.col("payload").alias("payload"),
        )
    )
    parsed = ok_http.filter(F.col("envelope").isNotNull())
    card_err = (
        parsed.filter(F.size("envelope") != 1)
        .select(
            "center",
            F.lit("envelope").alias("stage"),
            F.concat(F.lit("cardinality_"), F.size("envelope").cast("string")).alias(
                "reason"
            ),
            F.col("payload").alias("payload"),
        )
    )
    ok = (
        parsed.filter(F.size("envelope") == 1)
        .select(
            "center",
            F.element_at("envelope", 1).getField("retrieved").alias("retrieved"),
            # null data → zero rows after explode (A7: coalesce to empty)
            F.coalesce(
                F.element_at("envelope", 1).getField("data"),
                F.array().cast(T.ArrayType(INCIDENT_SCHEMA)),
            ).alias("data"),
        )
    )
    errors = http_err.unionByName(parse_err).unionByName(card_err)
    return ok, errors


def explode_incidents(ok_env: DataFrame) -> DataFrame:
    """A8: unnest the per-center incident array (task.ts:108).  NULL
    collections were already coalesced to empty → they vanish here."""
    return ok_env.select(
        "center", "retrieved", F.explode("data").alias("incident")
    ).select("center", "retrieved", "incident.*")


def time_filter_condition(incident_range: str | None, now: Column) -> Column:
    """A9 predicate (task.ts:109-116), verified edge semantics: a date
    moment cannot parse is KEPT (isBefore → false).  ``incident_range``
    falsy → no filtering (JS truthiness guard, task.ts:109)."""
    if not incident_range:
        return F.lit(True)
    interval = INCIDENT_RANGES[incident_range]
    ts = F.try_to_timestamp(F.col("date"))
    cutoff = now - F.expr(f"INTERVAL {interval}")
    return ts.isNull() | (ts >= cutoff)


def filter_time_range(
    incidents: DataFrame, incident_range: str | None, now: Column
) -> DataFrame:
    return incidents.filter(time_filter_condition(incident_range, now))


def normalize_dates(incidents: DataFrame) -> tuple[DataFrame, DataFrame]:
    """A10 + §2.1.4: truncate-to-minute date rewrite (task.ts:118).  The
    reference mutates in place *before* the metadata spread, so the
    truncated string — not the raw API value — lands in metadata.date;
    we overwrite the ``date`` column for the same effect.  Unparsable
    dates (which the reference would format as 'Invalid date') go to the
    error channel instead."""
    ts = F.try_to_timestamp(F.col("date"))
    date_err = (
        incidents.filter(ts.isNull())
        .select(
            "center",
            F.lit("normalize_date").alias("stage"),
            F.lit("unparsable_date").alias("reason"),
            F.to_json(F.struct("uuid", "date")).alias("payload"),
        )
    )
    ok = incidents.filter(ts.isNotNull()).withColumn("date", truncate_minute("date"))
    return ok, date_err


def filter_valid_geo(incidents: DataFrame) -> DataFrame:
    """A11 (task.ts:120-124): drop rows whose lon/lat is falsy,
    non-numeric, or exactly 0 (Null Island, CHANGELOG.md:93).  Spark's
    try_cast-to-double reproduces the verified JS Number() truth table —
    including whitespace tolerance (' 105.5 ' kept)."""
    return incidents.filter(geo_valid("longitude") & geo_valid("latitude"))


def to_features(incidents: DataFrame) -> DataFrame:
    """A12-A16 (task.ts:126-140): assemble the GeoJSON Feature struct.

    id = 'wildweb-' + uuid; callsign = name; start = truncated date;
    metadata = full-record pass-through (CHANGELOG.md:88 — column
    pruning must never drop source fields, hence struct of *all* 15);
    geometry.coordinates = [-Number(longitude), Number(latitude)] — the
    feed reports western-hemisphere longitudes positive, so the sign is
    flipped (task.ts:138, CHANGELOG.md:160)."""
    return incidents.select(
        "center",
        F.struct(
            F.concat(F.lit("wildweb-"), F.col("uuid")).alias("id"),
            F.lit("Feature").alias("type"),
            F.struct(
                F.col("name").alias("callsign"),
                F.col("date").alias("start"),
                F.struct(*[F.col(f) for f in INCIDENT_FIELDS]).alias("metadata"),
            ).alias("properties"),
            F.struct(
                F.lit("Point").alias("type"),
                F.array(
                    -js_number("longitude"), js_number("latitude")
                ).alias("coordinates"),
            ).alias("geometry"),
        ).alias("feature"),
    )


def union_centers(dfs: Iterable[DataFrame]) -> DataFrame:
    """A17: union-all of per-center results (task.ts:70-73,142)."""
    return functools.reduce(DataFrame.unionByName, dfs)


def flatten_features(features: DataFrame) -> DataFrame:
    """Flatten the Feature struct to scalar columns (for oracle checks
    and columnar sinks)."""
    return features.select(
        F.col("feature.id").alias("id"),
        F.col("feature.properties.callsign").alias("callsign"),
        F.col("feature.properties.start").alias("start"),
        F.element_at("feature.geometry.coordinates", 1).alias("lon"),
        F.element_at("feature.geometry.coordinates", 2).alias("lat"),
    )


def run_pipeline(
    raw_envelopes: DataFrame,
    incident_range: str | None,
    now: Column,
) -> tuple[DataFrame, DataFrame]:
    """The full A5-A17 dataflow over raw per-center fetch results.

    ``raw_envelopes`` schema: (center string, payload string — the HTTP
    body, http_ok boolean).  Returns (features, errors): features is one
    GeoJSON Feature struct per surviving incident; errors is the
    per-source error channel (A19 — the reference accumulates per-center
    errors and still submits partial results, task.ts:75-157)."""
    ok_env, env_errors = validate_envelopes(parse_envelope(raw_envelopes))
    incidents = explode_incidents(ok_env)
    in_window = filter_time_range(incidents, incident_range, now)
    dated, date_errors = normalize_dates(in_window)
    features = to_features(filter_valid_geo(dated))
    return features, env_errors.unionByName(date_errors)


# --------------------------------------------------- registry entries

# The driver's oracle can only see the shared testdata tables, so the
# hash-checked pipeline query derives WildWeb-shaped string records from
# ``orders`` deterministically (same derivation in the DuckDB SQL below):
# numerics-as-strings, planted invalid coordinates ('0', 'abc', '',
# whitespace-padded), and unparsable dates ('n/a') — every CHANGELOG edge
# case that is derivable without a JSON fixture.  The JSON envelope path
# (A5-A7) is exercised by the golden tests (tests/test_wildweb.py).

_SYNTH_NOW = "1998-01-08 00:00:00"

_SYNTH_EXPRS = {
    "center": "'C' || CAST(o_orderkey % 5 AS STRING)",
    "uuid": "CAST(o_orderkey AS STRING)",
    "name": "o_orderpriority",
    "date": """CASE WHEN o_orderkey % 47 = 0 THEN 'n/a'
        ELSE date_format(o_orderdate + make_interval(0,0,0,0,0,CAST(o_orderkey % 13 AS INT),CAST(o_orderkey % 59 AS INT)), 'yyyy-MM-dd HH:mm:ss') END""",
    "latitude": """CASE WHEN o_orderkey % 37 = 0 THEN '0'
        WHEN o_orderkey % 41 = 0 THEN 'abc'
        ELSE CAST(CAST(36 + (o_orderkey % 400)/100.0 AS DECIMAL(8,2)) AS STRING) END""",
    "longitude": """CASE WHEN o_orderkey % 43 = 0 THEN ''
        WHEN o_orderkey % 53 = 0 THEN ' 105.5 '
        ELSE CAST(CAST(102 + (o_orderkey % 700)/100.0 AS DECIMAL(8,2)) AS STRING) END""",
}

_SYNTH_SQL = """
    SELECT 'C' || CAST(o_orderkey % 5 AS VARCHAR) AS center,
           CAST(o_orderkey AS VARCHAR) AS uuid,
           o_orderpriority AS name,
           CASE WHEN o_orderkey % 47 = 0 THEN 'n/a'
                ELSE strftime(o_orderdate + (o_orderkey % 13) * INTERVAL 1 MINUTE
                                          + (o_orderkey % 59) * INTERVAL 1 SECOND,
                              '%Y-%m-%d %H:%M:%S') END AS date,
           CASE WHEN o_orderkey % 37 = 0 THEN '0'
                WHEN o_orderkey % 41 = 0 THEN 'abc'
                ELSE CAST(CAST(36 + (o_orderkey % 400)/100.0 AS DECIMAL(8,2)) AS VARCHAR) END AS latitude,
           CASE WHEN o_orderkey % 43 = 0 THEN ''
                WHEN o_orderkey % 53 = 0 THEN ' 105.5 '
                ELSE CAST(CAST(102 + (o_orderkey % 700)/100.0 AS DECIMAL(8,2)) AS VARCHAR) END AS longitude
    FROM orders
"""


def _synth_incidents(spark, sf_dir: str) -> DataFrame:
    from ..io import table

    o = table(spark, sf_dir, "orders")
    cols = [F.expr(e).alias(n) for n, e in _SYNTH_EXPRS.items()]
    # remaining incident fields: constants/nulls (full 15-field shape)
    fill = {
        "ic": F.lit(None).cast("string"),
        "type": F.lit("Wildfire"),
        "acres": F.lit("0.1"),
        "fuels": F.lit(None).cast("string"),
        "inc_num": F.lit(None).cast("string"),
        "fire_num": F.lit(None).cast("string"),
        "location": F.lit(None).cast("string"),
        # CAST(NULL AS VARIANT), not try_parse_json(NULL): identical
        # schema and value (verified), but the cast is a foldable
        # literal while try_parse_json evaluated per row — it was the
        # whole ~0.2 s wildweb_pipeline drift between rounds 1 and 4.
        "resources": F.lit(None).cast("variant"),
        "webComment": F.lit(None).cast("string"),
        "fire_status": F.lit("Active"),
        "fiscal_data": F.lit(""),
    }
    return o.select(*cols, *[c.alias(n) for n, c in fill.items()])


@query(
    "wildweb_pipeline",
    oracle=f"""
    WITH synth AS ({_SYNTH_SQL}),
    filtered AS (
      SELECT * FROM synth
      WHERE TRY_CAST(date AS TIMESTAMP) IS NULL
         OR TRY_CAST(date AS TIMESTAMP) >= TIMESTAMP '{_SYNTH_NOW}' - INTERVAL 7 DAY
    ),
    dated AS (
      SELECT *, strftime(date_trunc('minute', TRY_CAST(date AS TIMESTAMP)),
                         '%Y-%m-%d %H:%M') AS start
      FROM filtered WHERE TRY_CAST(date AS TIMESTAMP) IS NOT NULL
    )
    SELECT 'wildweb-' || uuid AS id,
           name AS callsign,
           start,
           -TRY_CAST(longitude AS DOUBLE) AS lon,
           TRY_CAST(latitude AS DOUBLE) AS lat
    FROM dated
    WHERE TRY_CAST(longitude AS DOUBLE) IS NOT NULL AND TRY_CAST(longitude AS DOUBLE) <> 0
      AND TRY_CAST(latitude  AS DOUBLE) IS NOT NULL AND TRY_CAST(latitude  AS DOUBLE) <> 0
    """,
)
def wildweb_pipeline(spark, sf_dir: str) -> DataFrame:
    """A9-A16 end-to-end over orders-derived WildWeb-shaped records:
    time-range filter ('1 Week', fixed now), minute-truncation date
    rewrite, JS-truthiness geo filter, feature assembly + flatten.
    Hash-checked against the identical derivation in DuckDB."""
    incidents = _synth_incidents(spark, sf_dir)
    in_window = filter_time_range(incidents, "1 Week", F.lit(_SYNTH_NOW).cast("timestamp"))
    dated, _ = normalize_dates(in_window)
    return flatten_features(to_features(filter_valid_geo(dated)))


@query(
    "wildweb_pipeline_errors",
    oracle=f"""
    WITH synth AS ({_SYNTH_SQL})
    SELECT 'normalize_date' AS stage, 'unparsable_date' AS reason, count(*) AS n
    FROM synth WHERE TRY_CAST(date AS TIMESTAMP) IS NULL
    """,
)
def wildweb_pipeline_errors(spark, sf_dir: str) -> DataFrame:
    """A19 error channel: per-stage error accumulation (the engine's
    replacement for the reference's throw-after-submit, task.ts:151-157)."""
    incidents = _synth_incidents(spark, sf_dir)
    in_window = filter_time_range(incidents, "1 Week", F.lit(_SYNTH_NOW).cast("timestamp"))
    _, errors = normalize_dates(in_window)
    return errors.groupBy("stage", "reason").agg(F.count(F.lit(1)).alias("n"))


@query("wildweb_envelope_e2e")  # JSON envelope path → rows-only (A5-A17)
def wildweb_envelope_e2e(spark, sf_dir: str) -> DataFrame:
    """Full pipeline including the JSON envelope decode: wraps the synth
    incidents into per-center JSON envelopes (as the WildWeb API would
    return them), then runs parse→validate→explode→filter→features.
    Rows-only check here; exact-output coverage is in the golden tests."""
    incidents = _synth_incidents(spark, sf_dir)
    payloads = (
        incidents.groupBy("center")
        .agg(F.collect_list(F.struct(*INCIDENT_FIELDS)).alias("data"))
        .select(
            "center",
            F.to_json(
                F.array(
                    F.struct(
                        F.lit("2026-01-01T00:00:00Z").alias("retrieved"),
                        F.col("data").alias("data"),
                    )
                )
            ).alias("payload"),
            F.lit(True).alias("http_ok"),
        )
    )
    features, _ = run_pipeline(
        payloads, "1 Week", F.lit(_SYNTH_NOW).cast("timestamp")
    )
    return flatten_features(features)
