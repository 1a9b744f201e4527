"""Ninth wave: physical-strategy and window-analytics surface.

- salted_segment_value: the skew-safe salted equi-join (operators/
  layout.salted_join) pushed through the correctness gate — the
  oracle is the PLAIN join, proving salting is a pure physical
  rewrite (same rows, S× the parallelism on a hot key).
- order_price_position: the remaining ranking-family window
  analytics (percent_rank, cume_dist, nth_value over an explicit
  unbounded frame) the engine exposes but no query exercised yet.

Scale notes: the salted join spreads one hot user over S tasks at the
cost of replicating the small side S× — the dial for the 1-user-with-
10⁸-events shape AQE's skew handling can't split (single-key skew
inside one partition). The window query shuffles once on the
partition key; percent_rank/cume_dist are rank arithmetic inside the
sorted partition, no extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load
from . import query


@query(
    "salted_segment_value",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def salted_segment_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events ⨝ customer through layout.salted_join (S=8): the big side
    gets a hash salt, the dimension is exploded 8×, and the join key
    becomes (custkey, salt). The oracle's plain join proves the rewrite
    changes nothing semantically. Decimal-cast-before-sum keeps the
    aggregate exact under any partition order (relational8.py note).
    """
    from ..operators.layout import salted_join

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"),
        F.col("value").cast("decimal(18,6)").alias("value"),
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(ev, cust, key="c_custkey", salt_buckets=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).cast("double").alias("total_value"),
    )


@query(
    "order_price_position",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER w, 6) AS price_pct_rank,
           round(cume_dist() OVER w, 6) AS price_cume_dist,
           nth_value(o_totalprice, 2) OVER (
             PARTITION BY o_orderpriority
             ORDER BY o_totalprice ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_lowest_price
    FROM orders
    WHERE o_orderstatus = 'F'
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC)
    """,
)
def order_price_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist + partition-wide nth_value per priority
    class. percent_rank/cume_dist order by price alone (ties share a
    value identically in both engines — rank arithmetic, not row
    position); nth_value orders by (price, orderkey) with an explicit
    unbounded frame so the picked row is deterministic."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    w = Window.partitionBy("o_orderpriority").orderBy(F.asc("o_totalprice"))
    w_nth = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
        F.nth_value("o_totalprice", 2).over(w_nth).alias("second_lowest_price"),
    )


@query(
    "time_weighted_value",
    oracle="""
    WITH seq AS (
      SELECT user_id, value, epoch_us(ts) AS us,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS next_us
      FROM events
    )
    SELECT user_id,
           count(*) AS n_intervals,
           round(sum(value * (next_us - us)) / sum(next_us - us), 6)
             AS tw_avg_value
    FROM seq
    WHERE next_us IS NOT NULL
    GROUP BY user_id
    HAVING sum(next_us - us) > 0
    """,
    bench=True,
)
def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user (the TimescaleDB time_weight
    aggregate, LOCF flavor): each reading counts proportionally to how
    long it stayed current — the honest mean for irregularly-sampled
    telemetry, where a plain avg over-weights bursts. The last reading
    per key has no duration and is excluded, as in the SQL spelling;
    so is a key whose TOTAL duration is zero (all events in the same
    microsecond) — 0/0 is NULL in Spark but NaN in DuckDB's IEEE float
    division, so the degenerate group must not reach the divide.

    Scale: one shuffle on the partition key for the lead() window,
    then an ordinary partial-agg — same cost as any per-key sort;
    no self-join (the naive spelling pairs each row with its
    successor via join, doubling the shuffle)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("us"), F.asc("event_id"))
    # integer div, not /1000: ns epochs (~1.7e18) exceed double's exact
    # integer range, so float division could land 1 µs off
    us = F.expr("ts_ns div 1000")
    seq = ev.select(
        "user_id", "value", us.alias("us"), "event_id"
    ).withColumn("next_us", F.lead("us").over(w))
    return (
        seq.filter(F.col("next_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(F.col("value") * (F.col("next_us") - F.col("us"))).alias("_wsum"),
            F.sum(F.col("next_us") - F.col("us")).alias("_dur"),
        )
        .filter(F.col("_dur") > 0)  # oracle HAVING: 0/0 is NULL here, NaN there
        .select(
            "user_id",
            "n_intervals",
            F.round(F.col("_wsum") / F.col("_dur"), 6).alias("tw_avg_value"),
        )
    )


@query(
    "quantity_quartile_buckets",
    oracle="""
    WITH b AS (
      SELECT quantile_cont(l_quantity, 0.25) AS q1,
             quantile_cont(l_quantity, 0.50) AS q2,
             quantile_cont(l_quantity, 0.75) AS q3
      FROM lineitem
    )
    SELECT CASE WHEN l_quantity <= q1 THEN 1
                WHEN l_quantity <= q2 THEN 2
                WHEN l_quantity <= q3 THEN 3
                ELSE 4 END AS bucket,
           count(*) AS n_rows,
           round(min(l_quantity), 2) AS min_q,
           round(max(l_quantity), 2) AS max_q
    FROM lineitem, b
    GROUP BY 1
    """,
)
def quantity_quartile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global quantile bucketing WITHOUT a single-partition window —
    the fact-scale alternative SCALE.md's trade-offs section promises
    for `balance_quartiles`' global ntile: quartile boundaries come
    from one aggregate (3 numbers), broadcast into a map-side CASE.
    The fact table is scanned, never globally sorted. At 100 TB swap
    the exact percentile for approx_percentile — same plan shape,
    sketch-sized aggregate state (exact here for oracle parity)."""
    li = load(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("q1"),
        F.percentile("l_quantity", F.lit(0.50)).alias("q2"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q3"),
    )
    bucket = (
        F.when(F.col("l_quantity") <= F.col("q1"), 1)
        .when(F.col("l_quantity") <= F.col("q2"), 2)
        .when(F.col("l_quantity") <= F.col("q3"), 3)
        .otherwise(4)
    )
    return (
        li.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("l_quantity"), 2).alias("min_q"),
            F.round(F.max("l_quantity"), 2).alias("max_q"),
        )
    )


@query(
    "locf_event_values",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type <> 'error' THEN value END
                      IGNORE NULLS) OVER (
             PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id
             ROWS UNBOUNDED PRECEDING
           ) AS filled_value
    FROM events
    """,
)
def locf_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap filling: readings flagged
    bad (event_type='error' stands in for a NULL sensor value) take the
    user's most recent good value; leading bad readings stay NULL. One
    keyed sort + a last(ignorenulls) running frame — the standard LOCF
    spelling, no self-join. Values are copied, not computed, so parity
    needs no rounding."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts_ns"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    good = F.when(F.col("event_type") != "error", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.last(good, ignorenulls=True).over(w).alias("filled_value"),
    )


_FUZZY_MAX_DIST = 4


@query(
    "similar_part_names",
    oracle=f"""
    WITH n AS (SELECT DISTINCT p_name FROM part),
    b AS (SELECT p_name, string_split(p_name, ' ')[-1] AS blk FROM n)
    SELECT a.p_name AS name_a, c.p_name AS name_b,
           levenshtein(a.p_name, c.p_name) AS dist
    FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
    WHERE levenshtein(a.p_name, c.p_name) <= {_FUZZY_MAX_DIST}
    """,
)
def similar_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join (entity resolution): candidate pairs meet
    only inside a blocking key (the name's last token), then exact
    Levenshtein filters — the classic blocking-then-verify shape that
    replaces the O(N²) cross join. Pairing goes through
    capped_block_join (r7): lossless length banding inside the block
    plus a per-block size cap with char-shingle LSH fallback, so
    candidate pairs stay bounded when the blocking key's ~constant
    cardinality meets a growing corpus (see SCALE.md 'blocked fuzzy
    join'). At gate SFs every block ≤ 8 names — the exact route (and
    the oracle's plain blocked join) is what runs."""
    from ..operators.dedup import capped_block_join

    names = (
        load(spark, sf_dir, "part").select("p_name").distinct()
    )
    blk = F.element_at(F.split(F.col("p_name"), " "), -1)
    keyed = names.select(
        F.xxhash64("p_name").alias("nid"),
        F.col("p_name").alias("name"),
        blk.alias("blk"),
    )
    return (
        capped_block_join(keyed, max_len_diff=_FUZZY_MAX_DIST)
        .select(
            F.col("na").alias("name_a"),
            F.col("nb").alias("name_b"),
            F.levenshtein(F.col("na"), F.col("nb")).alias("dist"),
        )
        .filter(F.col("dist") <= _FUZZY_MAX_DIST)
    )


@query(
    "weekly_cohort_retention",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id,
             (epoch_us(ts) // 86400000000) // 7 AS wk
      FROM events
    ),
    coh AS (
      SELECT user_id, wk,
             min(wk) OVER (PARTITION BY user_id) AS cohort_wk
      FROM wk
    )
    SELECT cohort_wk, wk - cohort_wk AS age_weeks, count(*) AS n_users
    FROM coh GROUP BY 1, 2
    """,
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-active epoch
    week, counted in every later week they return — the standard
    retention analysis shape. cohort_wk comes from a min() window over
    the DISTINCT (user, week) activity table, not a join back to a
    separate firsts aggregate — one shuffle fewer, same rows.

    Scale: ONE shuffle on user_id builds each user's distinct-week set
    (collect_set partials dedupe map-side, so the shuffle carries
    |user×week|, not |events|), cohort_wk is array_min of the set —
    no second per-user shuffle, no sort — and the triangle aggregate
    shuffles only |cohorts × ages| rows. The distinct + min()-window
    spelling of the same query costs three shuffles and a sort.
    Weeks are epoch-day integers div 7 (UTC) — pure integer
    arithmetic, no calendar/timezone semantics to disagree on."""
    ev = load(spark, sf_dir, "events")
    wk_expr = F.expr("ts_ns div 86400000000000 div 7")
    per_user = (
        ev.select("user_id", wk_expr.alias("wk"))
        .groupBy("user_id")
        .agg(F.collect_set("wk").alias("wks"))
    )
    coh = per_user.select(
        F.array_min("wks").alias("cohort_wk"), F.explode("wks").alias("wk")
    )
    return coh.groupBy(
        "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("age_weeks")
    ).agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS to_type
      FROM events
    )
    SELECT from_type, to_type, count(*) AS n,
           round(count(*) / sum(count(*)) OVER (PARTITION BY from_type), 6)
             AS p
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: count (from, to) adjacent pairs, normalize each row of
    the matrix to probabilities. The successor comes from lead() over
    one (user, time) sort — no self-join; the row-normalizing window
    runs over the |types|² aggregated matrix, which is tiny by
    construction at any corpus size."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_ns"), F.asc("event_id"))
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    counts = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrow = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wrow), 6).alias("p"),
    )


@query(
    "conversion_funnel_users",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           regexp_matches(
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY epoch_us(ts), event_id),
             'v.*c.*p') AS funnel_complete
    FROM events
    GROUP BY user_id
    """,
)
def conversion_funnel_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event-sequence detection (the MATCH_RECOGNIZE / CEP
    funnel shape): did the user view, then click, then purchase, in
    chronological order with anything in between? The per-user event
    string is built order-independently — collect_list + array_sort on
    a (ts, id, initial) struct gives a deterministic sequence under any
    partition layout — then one regex does the pattern match. One
    groupBy shuffle; the per-user state is |events per user| bytes.
    Event-type initials are unique in this schema (v/c/p/s/e)."""
    ev = load(spark, sf_dir, "events")
    item = F.struct(
        F.col("ts_ns"), F.col("event_id"),
        F.substring("event_type", 1, 1).alias("i"),
    )
    arr = F.array_sort(F.collect_list(item))
    seq = F.concat_ws("", F.transform(arr, lambda x: x["i"]))
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        seq.rlike("v.*c.*p").alias("funnel_complete"),
    )


@query(
    "pareto_orders",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_totalprice AS price,
             epoch_ms(o_orderdate) // 86400000 AS order_day
      FROM orders
    ),
    m AS (
      SELECT o_orderkey, price, order_day,
             max(order_day) OVER (ORDER BY price DESC
                                  RANGE BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW
                                  EXCLUDE GROUP) AS prior_day,
             max(order_day) OVER (PARTITION BY price) AS peer_day
      FROM t
    )
    SELECT o_orderkey, price, order_day
    FROM m
    WHERE order_day = peer_day
      AND (prior_day IS NULL OR order_day > prior_day)
    """,
)
def pareto_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline: orders no other order beats on BOTH price and
    recency (Pareto frontier maximizing (o_totalprice, order day);
    exactly-equal pairs are both kept). Spark side runs the
    distributive two-stage operator (operators/analytics.skyline_2d:
    per-task local frontier, then one merge sweep over frontier rows
    only); the oracle spells the same dominance test with an
    EXCLUDE GROUP running-max window."""
    from ..operators.analytics import skyline_2d

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.expr(
            "unix_millis(cast(o_orderdate as timestamp)) div 86400000"
        ).alias("order_day"),
    )
    return skyline_2d(o, "price", "order_day")


@query(
    "rolling_active_users",
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
    SELECT win_day AS day, count(*) AS active_users_7d
    FROM x JOIN days ON win_day = days.day
    GROUP BY 1
    """,
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (the WAU engagement curve):
    a user active on day d counts toward days d..d+6, so each observed
    day reports the distinct users active in its trailing week. The
    naive spelling re-scans a 7-day interval per output day; this one
    explodes each DISTINCT user-day into the ≤7 window days it feeds —
    the standard interval-explode rewrite of a sliding COUNT DISTINCT.

    Scale: one event-scale shuffle (the user-day distinct); everything
    after is user-day sized (the 7× explode then dedups map-side into
    the second distinct). The observed-day semi join is broadcast-
    sized; the final aggregate moves |days| rows."""
    ev = load(spark, sf_dir, "events")
    day = F.expr("ts_ns div 86400000000000")
    ud = ev.select("user_id", day.alias("day")).distinct()
    x = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("win_day"),
    ).distinct()
    days = ud.select("day").distinct()
    return (
        x.join(
            F.broadcast(days), x["win_day"] == days["day"], "left_semi"
        )
        .groupBy(F.col("win_day").alias("day"))
        .agg(F.count(F.lit(1)).alias("active_users_7d"))
    )


@query(
    "rfm_segments",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS c_custkey,
             max(epoch_ms(o_orderdate) // 86400000) AS rec_day,
             count(*) AS freq,
             round(sum(o_totalprice), 2) AS mon
      FROM orders GROUP BY 1
    ),
    q AS (
      SELECT quantile_cont(rec_day, [0.2, 0.4, 0.6, 0.8]) AS qr,
             quantile_cont(freq,    [0.2, 0.4, 0.6, 0.8]) AS qf,
             quantile_cont(mon,     [0.2, 0.4, 0.6, 0.8]) AS qm
      FROM base
    )
    SELECT c_custkey,
           1 + CAST(rec_day > qr[1] AS INT) + CAST(rec_day > qr[2] AS INT)
             + CAST(rec_day > qr[3] AS INT) + CAST(rec_day > qr[4] AS INT)
             AS r_score,
           1 + CAST(freq > qf[1] AS INT) + CAST(freq > qf[2] AS INT)
             + CAST(freq > qf[3] AS INT) + CAST(freq > qf[4] AS INT)
             AS f_score,
           1 + CAST(mon > qm[1] AS INT) + CAST(mon > qm[2] AS INT)
             + CAST(mon > qm[3] AS INT) + CAST(mon > qm[4] AS INT)
             AS m_score
    FROM base CROSS JOIN q
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary, each
    scored 1-5): the classic marketing-analytics cube. Quintile
    boundaries come from ONE aggregate (12 numbers) broadcast into
    map-side comparisons — the same fact-scale bucketing strategy as
    quantity_quartile_buckets, never a global-sort ntile over the
    customer dimension. Monetary rounds to 2 before bucketing so the
    order-dependent float sum cannot straddle a boundary between
    engines."""
    o = load(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max(
            F.expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000")
        ).alias("rec_day"),
        F.count(F.lit(1)).alias("freq"),
        F.round(F.sum("o_totalprice"), 2).alias("mon"),
    )
    qs = [0.2, 0.4, 0.6, 0.8]
    q = base.agg(
        *[
            F.percentile(c, F.lit(p)).alias(f"q{c}_{i}")
            for c in ("rec_day", "freq", "mon")
            for i, p in enumerate(qs)
        ]
    )

    def score(col: str) -> F.Column:
        s = F.lit(1)
        for i in range(4):
            s = s + (F.col(col) > F.col(f"q{col}_{i}")).cast("int")
        return s

    return base.crossJoin(F.broadcast(q)).select(
        "c_custkey",
        score("rec_day").alias("r_score"),
        score("freq").alias("f_score"),
        score("mon").alias("m_score"),
    )


@query(
    "sequence_pair_support",
    oracle="""
    WITH firsts AS (
      SELECT user_id, event_type, min(epoch_us(ts)) AS first_us
      FROM events GROUP BY user_id, event_type
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_users
    FROM firsts a JOIN firsts b
      ON a.user_id = b.user_id
     AND a.event_type <> b.event_type
     AND a.first_us < b.first_us
    GROUP BY 1, 2
    """,
)
def sequence_pair_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern support (the 2-sequence core of GSP/PrefixSpan
    association mining): for every ordered type pair (a, b), how many
    users saw their first a strictly before their first b. The
    per-user reduction to first-occurrence timestamps happens BEFORE
    any pairing, so the self-join operates on |users|×|types| rows
    (co-partitioned on user_id — one shuffle, reused by both sides)
    and fans out at most |types|² per user."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id", "event_type").agg(
        F.min("ts_ns").alias("_first")
    )
    a = firsts.select(
        "user_id", F.col("event_type").alias("type_a"), F.col("_first").alias("_fa")
    )
    b = firsts.select(
        "user_id", F.col("event_type").alias("type_b"), F.col("_first").alias("_fb")
    )
    return (
        a.join(b, "user_id")
        .filter(
            (F.col("type_a") != F.col("type_b")) & (F.col("_fa") < F.col("_fb"))
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "user_cusum_extremes",
    oracle="""
    WITH m AS (SELECT round(avg(value), 6) AS mu FROM events),
    c AS (
      SELECT user_id,
             sum(value - mu) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id
               ROWS UNBOUNDED PRECEDING
             ) AS cusum
      FROM events, m
    )
    SELECT user_id, count(*) AS n_events,
           round(max(cusum), 2) AS max_pos_drift,
           round(min(cusum), 2) AS max_neg_drift
    FROM c GROUP BY user_id
    """,
)
def user_cusum_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift extremes per user — the classic changepoint /
    sensor-drift monitor: the running sum of deviations from the
    global mean peaks where a user's behavior shifts regime. The mean
    is ROUNDED to 6 before the scan on both sides, so the sequential
    prefix sum folds bit-identical values in identical order — exact
    engine parity despite being float arithmetic. One ordered window
    per user, one aggregate; nothing global except the 1-row mean."""
    ev = load(spark, sf_dir, "events")
    mu = ev.agg(F.round(F.avg("value"), 6).alias("mu"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts_ns"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = ev.crossJoin(F.broadcast(mu)).withColumn(
        "cusum", F.sum(F.col("value") - F.col("mu")).over(w)
    )
    return c.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.max("cusum"), 2).alias("max_pos_drift"),
        F.round(F.min("cusum"), 2).alias("max_neg_drift"),
    )
