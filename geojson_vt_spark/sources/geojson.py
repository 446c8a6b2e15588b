"""GeoJSON file source (S1, /root/reference/src/convert.js:7-23).

Reads a GeoJSON document (FeatureCollection / Feature / bare geometry)
into the ingest-row shape the distributed convert stage consumes.
Normalization (FeatureCollection explode with positional ordinals for
generateId) happens relationally via posexplode, so a many-GB
FeatureCollection parses once JVM-side; only the per-feature convert
kernel touches Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """GeoJSON file → (input_ord, gen_index, feature_json) ingest rows."""
    raw = spark.read.option("multiLine", "true").json(path)
    cols = set(raw.columns)

    if "features" in cols:  # FeatureCollection
        # keep features as raw JSON strings: properties/ids are
        # schema-free and must round-trip untouched
        txt = spark.read.text(path, wholetext=True)
        feats = txt.select(F.posexplode(_features_json_array(F.col("value")))
                           .alias("input_ord", "feature_json"))
        return feats.select(
            F.col("input_ord").cast("long"),
            F.col("input_ord").cast("long").alias("gen_index"),
            "feature_json")

    txt = spark.read.text(path, wholetext=True)
    if "geometry" in cols or raw.select(
            F.col("type")).first()["type"] == "Feature":
        return txt.select(F.lit(0).cast("long").alias("input_ord"),
                          F.lit(None).cast("long").alias("gen_index"),
                          F.col("value").alias("feature_json"))
    # bare geometry / geometry collection
    return txt.select(F.lit(0).cast("long").alias("input_ord"),
                      F.lit(None).cast("long").alias("gen_index"),
                      F.concat(F.lit('{"geometry":'), F.col("value"),
                               F.lit("}")).alias("feature_json"))


def _features_json_array(doc):
    """Extract the features array as JSON strings, JVM-side."""
    return F.from_json(
        doc, "struct<features: array<string>>",
        {"mode": "PERMISSIVE"})["features"]
