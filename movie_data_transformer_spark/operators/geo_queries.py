"""Spark 4.1 geospatial surface (GEOMETRY type, WKB codecs, SRID),
gated behind spark.sql.geospatial.enabled.

The shipped function set on 4.1.2 is the storage layer — WKB
parse/serialize (st_geomfromwkb / st_asbinary / st_geogfromwkb) and
SRID handling (st_srid / st_setsrid) — not yet a predicate/measure
library, so the entry binds exactly that: well-known-binary round-trips
BYTE-EXACTLY through the GEOMETRY type and SRID metadata survives
set/get. Four fixed point geometries (little-endian WKB hex literals)
are assigned by user_id % 4, so the DuckDB oracle reproduces every
output — including the round-tripped hex itself — from user_id alone.

Scale: WKB parse/serialize is JVM expression work, map-side; geometry
columns behave like any binary column for shuffles/joins. At 100 TB the
pattern is: keep WKB in the lake, materialize GEOMETRY per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from movie_data_transformer_spark.sources.tables import load_table

#: little-endian WKB POINT literals: (1 2), (3 4), (-5 0.5), (100 -7)
_WKB = [
    "0101000000000000000000f03f0000000000000040",
    "010100000000000000000008400000000000001040",
    "010100000000000000000014c0000000000000e03f",
    "010100000000000000000059400000000000001cc0",
]

_CASE = "CASE " + " ".join(
    f"WHEN user_id % 4 = {i} THEN '{h}'" for i, h in enumerate(_WKB)
) + " END"


def q_geo_wkb_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # enabling the surface is additive and version-verified (NOTES #8
    # discipline): the flag exists on 4.1.2 and only unlocks the ST
    # functions, so it is left on for the session
    spark.conf.set("spark.sql.geospatial.enabled", "true")
    ev = load_table(spark, sf_dir, "events")
    geo = ev.selectExpr(
        "user_id % 4 AS point_class",
        f"st_geomfromwkb(unhex({_CASE})) AS g",
    )
    per_row = geo.selectExpr(
        "point_class",
        "lower(hex(st_asbinary(g))) AS wkb_hex",
        "CAST(st_srid(g) AS BIGINT) AS srid_default",
        "CAST(st_srid(st_setsrid(g, 4326)) AS BIGINT) AS srid_set",
    )
    return (
        per_row.groupBy("point_class", "wkb_hex", "srid_default", "srid_set")
        .count()
        .selectExpr(
            "CAST(point_class AS BIGINT) AS point_class",
            "wkb_hex",
            "srid_default",
            "srid_set",
            "CAST(count AS BIGINT) AS n_rows",
        )
    )


SQL_GEO_WKB_ROUNDTRIP = (
    """
SELECT CAST(user_id % 4 AS BIGINT) AS point_class,
       """
    + _CASE
    + """ AS wkb_hex,
       CAST(0 AS BIGINT) AS srid_default,
       CAST(4326 AS BIGINT) AS srid_set,
       CAST(count(*) AS BIGINT) AS n_rows
FROM events
GROUP BY 1, 2
"""
)


QUERIES = {
    "geo_wkb_roundtrip": (q_geo_wkb_roundtrip, SQL_GEO_WKB_ROUNDTRIP),
}
