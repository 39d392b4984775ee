"""Geospatial operators — the reference's problem domain (wildfire CAD
incidents are points on a map; task.ts:126-140 emits GeoJSON Point
features).  At 100 TB the engine-side question is always the same:
find point pairs/neighbors WITHOUT the O(n²) cross join.  The answer
here is the standard grid-cell decomposition (the GeoSpark/Sedona
partitioning pattern): bucket every point into a radius-sized cell,
probe each point against its 3×3 cell neighborhood via a plain
equi-join, verify the exact distance predicate on candidates only.

Determinism: coordinates live in INTEGER micro-degrees; the distance
predicate dx² + dy² ≤ r² is exact BIGINT arithmetic (equirectangular —
the honest small-radius approximation; a production haversine runs the
same plan with the trig in the verify stage only).  The demo derives
deterministic point coordinates from event ids via md5 (engine-
portable, regeneration-proof) since the shared testdata tables carry
no geo columns; the wildweb ingest path (ingest/wildweb.py) is where
real coordinates enter the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import query
from .sampling import SQL_BUCKET, hash_bucket

#: Demo geometry: points over a 50°×50° region, proximity radius 0.1°.
GEO_SPAN_MICRO = 50_000_000
GEO_RADIUS_MICRO = 100_000


def _coord(key: F.Column, salt: str) -> F.Column:
    """Deterministic micro-degree coordinate in [0, GEO_SPAN_MICRO)."""
    return hash_bucket(F.concat(key.cast("string"), F.lit(salt)), GEO_SPAN_MICRO)


_SQL_COORD = SQL_BUCKET.replace("{key}", "CAST(event_id AS VARCHAR) || '{salt}'")


@query(
    "b166_spatial_cell_join",
    oracle=f"""
    WITH pts AS (
      SELECT event_id,
             {_SQL_COORD.format(salt="lat", n=GEO_SPAN_MICRO)} AS lat,
             {_SQL_COORD.format(salt="lon", n=GEO_SPAN_MICRO)} AS lon
      FROM events),
    cells AS (
      SELECT event_id, lat, lon,
             lat // {GEO_RADIUS_MICRO} AS cx,
             lon // {GEO_RADIUS_MICRO} AS cy
      FROM pts),
    probes AS (
      SELECT event_id, lat, lon, cx + dx.dx AS px, cy + dy.dy AS py
      FROM cells, (VALUES (-1), (0), (1)) dx(dx), (VALUES (-1), (0), (1)) dy(dy)),
    cand AS (
      SELECT a.event_id AS id_a, b.event_id AS id_b,
             (a.lat - b.lat) * (a.lat - b.lat)
               + (a.lon - b.lon) * (a.lon - b.lon) AS dist2
      FROM probes a JOIN cells b
        ON a.px = b.cx AND a.py = b.cy AND a.event_id < b.event_id)
    SELECT id_a, id_b, CAST(dist2 AS BIGINT) AS dist2_microdeg2
    FROM cand
    WHERE dist2 <= {GEO_RADIUS_MICRO}::BIGINT * {GEO_RADIUS_MICRO}
    """,
)
def b166_spatial_cell_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-cell spatial self-join: all point pairs within 0.1° — the
    incident-proximity query a wildfire CAD engine runs constantly
    (duplicate dispatches, nearby active incidents).  Cell side =
    radius, so any pair within r is in the same or an adjacent cell;
    each point probes its 3×3 neighborhood through a plain equi-join
    on (cell_x, cell_y) and candidates verify the exact integer
    predicate dx² + dy² ≤ r².  Each qualifying pair is found EXACTLY
    once (probe side explodes to 9 cells, build side stays in its own
    cell, id_a < id_b orients the pair) — no distinct needed.

    Scale: candidates ≈ 9·density per cell, never O(n²); the join is
    hash-partitioned by cell key, so hot regions (urban incident
    clusters) are the only skew concern — the salting / AQE-skew
    machinery from b59/b73 applies unchanged because it is just an
    equi-join.  At 100 TB the cell table is written bucketed by cell
    key and the probe explode is a narrow ×9."""
    ev = table(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        _coord(F.col("event_id"), "lat").alias("lat"),
        _coord(F.col("event_id"), "lon").alias("lon"),
    )
    cells = pts.select(
        "event_id",
        "lat",
        "lon",
        F.expr(f"lat div {GEO_RADIUS_MICRO}").alias("cx"),
        F.expr(f"lon div {GEO_RADIUS_MICRO}").alias("cy"),
    )
    d = F.array(F.lit(-1), F.lit(0), F.lit(1))
    probes = (
        cells.select(
            F.col("event_id").alias("id_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            "cx",
            "cy",
            F.explode(d).alias("dx"),
        )
        .select(
            "id_a",
            "lat_a",
            "lon_a",
            (F.col("cx") + F.col("dx")).alias("px"),
            "cy",
            F.explode(d).alias("dy"),
        )
        .select(
            "id_a", "lat_a", "lon_a", "px", (F.col("cy") + F.col("dy")).alias("py")
        )
    )
    build = cells.select(
        F.col("event_id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cx").alias("px"),
        F.col("cy").alias("py"),
    )
    dist2 = (F.col("lat_a") - F.col("lat_b")) * (
        F.col("lat_a") - F.col("lat_b")
    ) + (F.col("lon_a") - F.col("lon_b")) * (F.col("lon_a") - F.col("lon_b"))
    return (
        probes.join(build, ["px", "py"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            dist2.cast("bigint").alias("dist2_microdeg2"),
        )
        .filter(
            F.col("dist2_microdeg2")
            <= F.lit(GEO_RADIUS_MICRO).cast("bigint") * GEO_RADIUS_MICRO
        )
    )
