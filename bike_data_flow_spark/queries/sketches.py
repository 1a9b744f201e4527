"""Approximate sketch queries — the 100 TB answer to DISTINCT and
percentiles.

At fact scale, exact COUNT(DISTINCT) shuffles every distinct key and
exact percentiles need a global sort; the production spellings are
HyperLogLog++ (`approx_count_distinct`, mergeable fixed-size
registers, one partial-agg shuffle of sketch bytes) and the
Greenwald-Khanna quantile sketch (`approx_percentile`). Sketch outputs
are engine-specific, so they can't be hash-compared against DuckDB
directly. Instead each query embeds its own error check: it computes
the EXACT value (hash-verified by the oracle) alongside a boolean
`approx_ok` asserting the sketch landed within its documented error
bound — so the gate simultaneously proves the exact semantics and
bounds the sketch's error. At 100 TB you drop the exact column and
keep the sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from . import query


# HyperLogLog++ distinct users per event type. rsd=0.02 → the sketch
# must land within ±5·rsd of exact (a generous 5-sigma band so the
# gate never flakes); sketch bytes are constant-size per group, so the
# shuffle carries |groups| × ~1.5 KB regardless of corpus size.
@query(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS approx_ok
    FROM events
    GROUP BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= F.lit(0.1) * F.col("exact_users")
            ).alias("approx_ok"),
        )
    )


# Greenwald-Khanna quantile sketch vs exact interpolated percentiles
# of order value. Exact `percentile` matches DuckDB's quantile_cont;
# the GK sketch (accuracy=10000 → ε=1e-4) must land within 1% of the
# spread. The sketch is mergeable: one partial-agg pass, no global
# sort — the scalable path for fact-table quantiles.
@query(
    "approx_price_quantiles",
    oracle="""
    SELECT round(quantile_cont(o_totalprice, 0.50), 2) AS p50,
           round(quantile_cont(o_totalprice, 0.95), 2) AS p95,
           TRUE AS approx_ok
    FROM orders
    """,
)
def approx_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    exact = F.expr("percentile(o_totalprice, array(0.5, 0.95))")
    approx = F.expr("approx_percentile(o_totalprice, array(0.5, 0.95), 10000)")
    spread = F.max("o_totalprice") - F.min("o_totalprice")
    return (
        orders.agg(
            exact.alias("_ex"),
            approx.alias("_ap"),
            spread.alias("_spread"),
        )
        .select(
            F.round(F.col("_ex")[0], 2).alias("p50"),
            F.round(F.col("_ex")[1], 2).alias("p95"),
            (
                (F.abs(F.col("_ap")[0] - F.col("_ex")[0]) <= F.lit(0.01) * F.col("_spread"))
                & (F.abs(F.col("_ap")[1] - F.col("_ex")[1]) <= F.lit(0.01) * F.col("_spread"))
            ).alias("approx_ok"),
        )
    )


# Mergeability — the property that makes sketches THE 100 TB answer:
# per-group HLL sketches union into a global sketch without touching
# raw data again (same algebra as partial aggregation, but the partial
# state is persistable: daily sketches roll up to monthly/global for
# free). Spark 4 ships Apache DataSketches HLL (hll_sketch_agg /
# hll_union_agg). The oracle hash-verifies the exact global distinct;
# approx_ok asserts the MERGED sketch lands within 5% of it — proving
# union-of-groups ≈ global, not just sketch ≈ exact.
@query(
    "approx_distinct_merged",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS exact_custkeys,
           count(DISTINCT o_orderpriority) AS n_groups,
           TRUE AS approx_ok
    FROM orders
    """,
)
def approx_distinct_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    per_group = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_approx"),
        F.count(F.lit(1)).alias("n_groups"),
    )
    exact = orders.agg(F.count_distinct("o_custkey").alias("exact_custkeys"))
    return exact.crossJoin(merged).select(
        "exact_custkeys",
        "n_groups",
        (
            F.abs(F.col("_approx") - F.col("exact_custkeys"))
            <= F.lit(0.05) * F.col("exact_custkeys")
        ).alias("approx_ok"),
    )


# Count-min sketch heavy hitters: the fixed-memory answer to "top
# tokens" at corpus scale. The sketch is a d×w counter grid (d=4 rows,
# w=1024 columns → 4096 longs regardless of vocabulary size) built
# with ONE explode + partial-agg shuffle keyed by (row, col); the
# top-k candidates then probe it with a broadcast join and take
# min(counter) over the d rows. CMS guarantees est ≥ exact and
# est ≤ exact + ε·N with ε ≈ e/w — the embedded approx_ok asserts
# both, while the exact top-k list is hash-verified by the oracle
# (same contract as the HLL/GK queries above).
_CMS_D = 4
_CMS_W = 1024
_CMS_TOPK = 10


@query(
    "cms_heavy_hitters",
    oracle="""
    SELECT tok, count(*) AS cnt, TRUE AS approx_ok
    FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
          FROM documents)
    GROUP BY tok
    ORDER BY cnt DESC, tok ASC
    LIMIT 10
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), "\\s+")).alias("tok")
    )
    total = tok.agg(F.count(F.lit(1)).alias("_n"))

    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                F.pmod(F.xxhash64(F.col("tok"), F.lit(i)), F.lit(_CMS_W)).alias("c"),
            )
            for i in range(_CMS_D)
        ]
    )
    cms = (
        tok.select(F.explode(rows).alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("counter"))
    )

    exact_top = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(_CMS_TOPK)
    )
    probes = exact_top.select("tok", "cnt", F.explode(rows).alias("rc"))
    est = (
        probes.join(
            F.broadcast(cms),
            (F.col("rc.r") == F.col("r")) & (F.col("rc.c") == F.col("c")),
        )
        .groupBy("tok", "cnt")
        .agg(F.min("counter").alias("_est"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            "tok",
            "cnt",
            (
                (F.col("_est") >= F.col("cnt"))
                & (F.col("_est") <= F.col("cnt") + F.lit(0.01) * F.col("_n"))
            ).alias("approx_ok"),
        )
        .orderBy(F.desc("cnt"), F.asc("tok"))
    )


# Sketch-estimated SET INTERSECTION via inclusion–exclusion:
# |A∩B| ≈ hll(A) + hll(B) − hll(A∪B). Exact intersection rides the
# same gate row; the union-sketch subtraction compounds three ±rsd
# errors, so the acceptance band is wider (±5·rsd·|A∪B|, the term the
# error actually scales with). The audience-overlap / join-cardinality
# estimator at sketch cost — three constant-size sketches, no join.
@query(
    "approx_user_overlap",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT (SELECT count(*) FROM a) AS exact_a,
           (SELECT count(*) FROM b) AS exact_b,
           (SELECT count(*) FROM a JOIN b USING (user_id)) AS exact_overlap,
           TRUE AS approx_ok
    """,
)
def approx_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    is_a = F.col("event_type") == "click"
    is_b = F.col("event_type") == "purchase"
    agg = ev.filter(is_a | is_b).agg(
        F.count_distinct(F.when(is_a, F.col("user_id"))).alias("exact_a"),
        F.count_distinct(F.when(is_b, F.col("user_id"))).alias("exact_b"),
        (
            F.count_distinct(F.when(is_a, F.col("user_id")))
            + F.count_distinct(F.when(is_b, F.col("user_id")))
            - F.count_distinct("user_id")
        ).alias("exact_overlap"),
        F.approx_count_distinct(F.when(is_a, F.col("user_id")), rsd=0.02).alias(
            "_ha"
        ),
        F.approx_count_distinct(F.when(is_b, F.col("user_id")), rsd=0.02).alias(
            "_hb"
        ),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_hu"),
    )
    est = F.col("_ha") + F.col("_hb") - F.col("_hu")
    return agg.select(
        "exact_a",
        "exact_b",
        "exact_overlap",
        (
            F.abs(est - F.col("exact_overlap"))
            <= F.lit(5 * 0.02) * F.col("_hu")
        ).alias("approx_ok"),
    )


# Sliding-window distinct via MERGEABLE sketches: daily HLL sketches
# union over a trailing 7-day RANGE frame — the raw events are scanned
# ONCE into |days| sketch rows, and every window estimate costs a
# sketch merge, not a re-scan (the reason mergeable sketches exist:
# at 100 TB the exact interval-explode rewrite still shuffles
# user-day-sized data, while this rolls up 1.5 KB sketches over a
# calendar-bounded spine). The exact curve is hash-verified by the
# oracle; approx_ok asserts every day's sketch estimate lands within
# 5% of it.
@query(
    "rolling_hll_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    x AS (
      SELECT DISTINCT user_id, day + i AS win_day
      FROM ud CROSS JOIN generate_series(0, 6) AS s(i)
    )
    SELECT win_day AS day, count(*) AS active_users_7d, TRUE AS approx_ok
    FROM x JOIN days ON win_day = days.day
    GROUP BY 1
    """,
    bench=True,
)
def rolling_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    day = F.expr("ts_ns div 86400000000000")
    daily = ev.select(day.alias("day"), "user_id").groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    w = Window.orderBy("day").rangeBetween(-6, 0)
    est = daily.select(
        "day", F.hll_union_agg("sk").over(w).alias("_m")
    ).select("day", F.hll_sketch_estimate("_m").alias("_approx"))
    # exact arm (the rolling_active_users interval-explode spelling)
    ud = ev.select("user_id", day.alias("day")).distinct()
    x = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("win_day"),
    ).distinct()
    days = ud.select("day").distinct()
    exact = (
        x.join(F.broadcast(days), x["win_day"] == days["day"], "left_semi")
        .groupBy(F.col("win_day").alias("day"))
        .agg(F.count(F.lit(1)).alias("active_users_7d"))
    )
    return exact.join(est, "day").select(
        "day",
        "active_users_7d",
        (
            F.abs(F.col("_approx") - F.col("active_users_7d"))
            <= F.lit(0.05) * F.col("active_users_7d")
        ).alias("approx_ok"),
    )
