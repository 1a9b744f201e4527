"""Test-data table loaders.

The driver's synthetic tables (TESTDATA.md) live as one parquet file
per table under an sf directory. At 100 TB each of these would be a
partitioned/bucketed table; ``load`` keeps the call-site identical
either way (spark.read.parquet handles a file, a directory, or a
partitioned layout transparently, with column pruning + predicate
pushdown from the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# DataFrames are immutable logical plans: resolving a table once per
# session and reusing the plan (file index + schema already analyzed)
# is exactly what registering it in a catalog would do — and saves the
# per-query re-listing/footer-read that otherwise taxes every call.
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_PREPPED: set[str] = set()
_TUNED: set[tuple[str, str]] = set()


def _app_id(spark: SparkSession) -> str:
    return spark.sparkContext.applicationId


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    app = _app_id(spark)
    key = (app, sf_dir, name)
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    if app not in _PREPPED:
        # Oracle parity even under a caller-provided vanilla session:
        # DuckDB treats parquet timestamps as naive UTC, so collection
        # must too; events.parquet needs nanos-as-long (see below).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        _PREPPED.add(app)
    if (app, sf_dir) not in _TUNED:
        # Data-proportional shuffle sizing (tuning.plan_partitions): the
        # same rule gives ~2 reducers for the 18 MB bench dir and ~400
        # for 100 GB — per-task scheduling overhead never dominates and
        # big shuffles never underparallelize. Parquet compresses ~4×,
        # so estimate in-memory bytes from disk bytes.
        try:
            from .tuning import dir_bytes, tune_session

            tune_session(spark, dir_bytes(sf_dir) * 4)
        except OSError:
            pass  # non-local path (object store): caller tunes explicitly
        _TUNED.add((app, sf_dir))
    if name == "events":
        df = _load_events(spark, sf_dir)
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _DF_CACHE[key] = df
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's TimestampType
    (µs) cannot hold natively. Read nanos as long (legacy conf) and
    downcast to a µs timestamp — plus keep `ts_ns` so nothing is lost.
    Queries that must hash-match the DuckDB oracle expose epoch-millis
    BIGINTs instead of raw timestamps.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.select(
        "event_id",
        F.expr("timestamp_micros(ts div 1000)").alias("ts"),
        F.col("ts").alias("ts_ns"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() works too."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
