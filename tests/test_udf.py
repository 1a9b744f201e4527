from __future__ import annotations

import math

from pyspark.sql import functions as F

from bike_data_flow_spark.operators.udf import (
    haversine_native,
    haversine_pandas_udf,
    register_sql_udf,
)


def _points(spark):
    return spark.createDataFrame(
        [
            (51.1089, 17.0377, 51.1097, 17.0314),  # two Wrocław stations
            (51.0, 17.0, 51.0, 17.0),  # zero distance
            (0.0, 0.0, 0.0, 180.0),  # antipodal-ish
        ],
        ["lat1", "lon1", "lat2", "lon2"],
    )


def test_pandas_udf_matches_native(spark):
    df = _points(spark).select(
        haversine_native(
            F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
        ).alias("native"),
        haversine_pandas_udf("lat1", "lon1", "lat2", "lon2").alias("vectorized"),
    )
    for r in df.collect():
        assert math.isclose(r["native"], r["vectorized"], rel_tol=1e-12)


def test_known_distance_and_sql_registration(spark):
    rows = _points(spark)
    d = rows.select(
        haversine_native(
            F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
        ).alias("d")
    ).collect()
    assert 400 < d[0]["d"] < 500  # ~450 m between the two stations
    assert d[1]["d"] == 0.0
    assert math.isclose(d[2]["d"], math.pi * 6371000.0, rel_tol=1e-6)

    register_sql_udf(spark)
    rows.createOrReplaceTempView("pts")
    via_sql = spark.sql(
        "SELECT haversine_m(lat1, lon1, lat2, lon2) AS d FROM pts"
    ).collect()
    assert math.isclose(via_sql[0]["d"], d[0]["d"], rel_tol=1e-12)


def test_map_in_arrow_matches_native(spark):
    from bike_data_flow_spark.operators.udf import (
        haversine_map_in_arrow,
        haversine_native,
    )

    df = spark.createDataFrame(
        [(51.1089, 17.0377, 51.1097, 17.0314), (0.0, 0.0, 0.5, 0.5)],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    native = df.withColumn(
        "dist_m",
        haversine_native(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")),
    )
    arrow = haversine_map_in_arrow(df, "lat1", "lon1", "lat2", "lon2")
    for n, a in zip(sorted(native.collect()), sorted(arrow.collect())):
        assert abs(n["dist_m"] - a["dist_m"]) < 1e-6


def test_udtf_ngrams_match_native_shingles(spark):
    from bike_data_flow_spark.operators.dedup import shingles
    from bike_data_flow_spark.operators.udf import register_ngram_udtf
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "too short"), (3, None)],
        ["doc_id", "text"],
    )
    df.createOrReplaceTempView("udtf_docs")
    register_ngram_udtf(spark)
    via_udtf = {
        (r["doc_id"], r["pos"], r["ngram"])
        for r in spark.sql(
            "SELECT d.doc_id, g.pos, g.ngram "
            "FROM udtf_docs d, LATERAL token_ngrams(d.text, 3) g"
        ).collect()
    }
    via_native = {
        (r["doc_id"], r["pos"], r["ngram"])  # posexplode is 0-based, like eval()
        for r in df.select(
            "doc_id", F.posexplode(shingles(F.col("text"), 3)).alias("pos", "ngram")
        ).collect()
    }
    assert via_udtf == via_native
    assert {d for d, _, _ in via_udtf} == {1}  # short/null rows emit nothing
