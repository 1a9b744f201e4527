"""Vector similarity-search operators (north-star extension).

Embeddings are `array<float>` columns. All arithmetic is done in
DOUBLE via built-in higher-order functions (`zip_with` +
`aggregate` = left-fold dot product) — JVM-side, no Python, and the
left-to-right fold order matches DuckDB's list_sum fold so results are
oracle-reproducible bit-for-bit before rounding.

Scale design:
- brute-force top-k: one pass over N vectors, per-partition top-k via
  TakeOrderedAndProject (no global sort). The query vector is a
  broadcast single row.
- IVF-style: coarse partitions (here the given `label`; in general a
  trained codebook) → rank partitions by centroid distance → probe
  only the best `nprobe` partitions. This turns a full scan into a
  (nprobe/nlist) fraction scan — the standard ANN recall/cost dial.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _d(c: Column) -> Column:
    return c.cast("double")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left fold (order matches the SQL oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + _d(x) * _d(x))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# Few planes → big buckets → high recall; many planes → tiny buckets →
# fast probes, low recall. 4 planes ≈ corpus/16 per probe; tune with
# corpus size (rule of thumb: 2^planes ≈ corpus_size / desired_bucket).
N_HYPERPLANES = 4


def hyperplane_component(plane: int, dim_idx: int) -> int:
    """Deterministic pseudo-random hyperplane component in [-1000, 1000].

    Computed with md5 so the DuckDB oracle can regenerate the identical
    plane from SQL: CAST('0x'||substr(md5('hp{p}|{i}'),1,8) AS BIGINT)
    % 2001 - 1000. Evaluated ONCE at plan-build time (driver) and
    embedded as literals — zero per-row hashing.
    """
    import hashlib

    h = int(hashlib.md5(f"hp{plane}|{dim_idx}".encode()).hexdigest()[:8], 16)
    return h % 2001 - 1000


def hyperplane_bucket(
    vec: Column, dim: int, n_planes: int = N_HYPERPLANES
) -> Column:
    """Sign-of-dot-product LSH bucket id (cosine-preserving): bit p =
    [v · h_p > 0]. Vectors in the same bucket are likely cosine-close;
    at scale, partition the corpus by bucket and probe the query's
    bucket (plus Hamming-1 neighbors for recall)."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(
            *[F.lit(hyperplane_component(p, i)) for i in range(1, dim + 1)]
        )
        dot_p = F.aggregate(
            F.zip_with(vec, plane, lambda x, h: _d(x) * _d(h)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot_p > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_bucket_counts(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    n_planes: int = N_HYPERPLANES,
) -> DataFrame:
    """Corpus histogram over hyperplane buckets (the partition layout a
    bucket-partitioned ANN table would have)."""
    return (
        df.select(hyperplane_bucket(F.col(vec_col), dim, n_planes).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def lsh_topk(
    df: DataFrame,
    vec_id: int,
    dim: int,
    k: int = 10,
    n_planes: int = N_HYPERPLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN search: exact cosine only within the query's LSH bucket.
    Scans |corpus| / 2^planes of the data in expectation."""
    with_bucket = df.withColumn(
        "_bucket", hyperplane_bucket(F.col(vec_col), dim, n_planes)
    )
    qb = with_bucket.filter(F.col(id_col) == vec_id).select(
        F.col("_bucket").alias("_qbucket")
    )
    q = query_vector(df, vec_id, id_col, vec_col)
    return (
        with_bucket.join(
            F.broadcast(qb), F.col("_bucket") == F.col("_qbucket"), "left_semi"
        )
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.col("label"),
            F.round(cosine(F.col(vec_col), F.col("q")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def query_vector(df: DataFrame, vec_id: int, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """One-row DataFrame holding the query embedding (broadcast side)."""
    return df.filter(F.col(id_col) == vec_id).select(F.col(vec_col).alias("q"))


def cosine_topk(
    df: DataFrame,
    vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against the vector with id ``vec_id``.

    Deterministic: rounds to 6 decimals and tie-breaks on id.
    """
    q = query_vector(df, vec_id, id_col, vec_col)
    return (
        df.crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.col("label"),
            F.round(cosine(F.col(vec_col), F.col("q")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean per label, long form: (label, idx, centroid_val).

    posexplode → partial-agg shuffle keyed by (label, idx): rows after
    shuffle = nlist × dim regardless of N.
    """
    return (
        df.select(
            F.col(label_col),
            F.posexplode(F.col(vec_col)).alias("pos", "val"),
        )
        .groupBy(label_col, (F.col("pos") + 1).alias("idx"))
        .agg(F.round(F.avg(_d(F.col("val"))), 6).alias("centroid_val"))
    )


def ivf_topk(
    df: DataFrame,
    vec_id: int,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: probe only the ``nprobe`` labels whose centroid is
    nearest (squared L2) to the query, then exact cosine inside them.

    The coarse stage works on (label, idx) long form — no array
    materialization — and its output (nprobe label ids) is a broadcast
    semi-join filter on the fine stage, which therefore scans only the
    probed partitions (partition pruning if the table is partitioned by
    label).
    """
    cents = label_centroids(df, label_col, vec_col)
    qv = (
        df.filter(F.col(id_col) == vec_id)
        .select(F.posexplode(F.col(vec_col)).alias("pos", "qval"))
        .select((F.col("pos") + 1).alias("idx"), _d(F.col("qval")).alias("qval"))
    )
    dist = (
        cents.join(F.broadcast(qv), "idx")
        .groupBy(label_col)
        .agg(
            F.sum(
                (F.col("centroid_val") - F.col("qval"))
                * (F.col("centroid_val") - F.col("qval"))
            ).alias("l2sq")
        )
        .orderBy(F.asc("l2sq"), F.asc(label_col))
        .limit(nprobe)
        .select(label_col)
    )
    probed = df.join(F.broadcast(dist), label_col, "left_semi")
    q = query_vector(df, vec_id, id_col, vec_col)
    return (
        probed.crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.col(label_col),
            F.round(cosine(F.col(vec_col), F.col("q")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
