"""Partition-sizing heuristics — SCALE.md's sizing rules as code.

Spark's two most consequential knobs scale with INPUT SIZE, not with
cluster size alone:

- `spark.sql.files.maxPartitionBytes`: how much each scan task reads.
- `spark.sql.shuffle.partitions`: post-shuffle parallelism; AQE
  coalesces down but won't split up (pre-AQE stages), so the static
  value must be high enough for the largest shuffle.

`tune_session` computes both from an input-bytes estimate so a job
runs with ~target-sized partitions whether it reads 60 MB or 100 TB.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession

MB = 1024 * 1024
GB = 1024 * MB

TARGET_PARTITION_BYTES = 128 * MB
MAX_SHUFFLE_PARTITIONS = 20000  # beyond this, scheduler overhead dominates
MIN_TASK_BYTES = 8 * MB  # don't add reducers that would see less than this


def dir_bytes(path: str | Path) -> int:
    """Recursive on-disk size of a local data directory (cheap driver-side
    estimate; on object stores use the catalog/statistics instead)."""
    p = Path(path)
    if p.is_file():
        return p.stat().st_size
    return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


def plan_partitions(
    input_bytes: int,
    default_parallelism: int,
    target_partition_bytes: int = TARGET_PARTITION_BYTES,
    shuffle_fraction: float = 0.5,
) -> dict[str, int]:
    """Compute the two knobs.

    shuffle_fraction estimates how much of the input survives to the
    widest shuffle (post-filter/projection); 0.5 is conservative for
    analytics, use lower when filters are selective.
    """
    scan_parts = max(1, -(-input_bytes // target_partition_bytes))
    shuffle_bytes = int(input_bytes * shuffle_fraction)
    # Parallelism floor scales DOWN with the data: every reduce task
    # costs ~5-10 ms of scheduling, so spreading an 8 MB shuffle over
    # 32 cores buys nothing and pays 32 task launches per stage
    # (measured: a trivial sf0.1 groupBy drops 0.45s → 0.20s going
    # 32 → data-sized partitions). Use all cores only once each would
    # see ≥ MIN_TASK_BYTES; above that, size by target_partition_bytes.
    floor = min(default_parallelism, max(1, -(-shuffle_bytes // MIN_TASK_BYTES)))
    shuffle_parts = max(
        floor,
        min(MAX_SHUFFLE_PARTITIONS, -(-shuffle_bytes // target_partition_bytes)),
    )
    return {
        "maxPartitionBytes": target_partition_bytes,
        "shufflePartitions": shuffle_parts,
        "expectedScanTasks": scan_parts,
    }


def tune_session(
    spark: SparkSession,
    input_bytes: int,
    target_partition_bytes: int = TARGET_PARTITION_BYTES,
    shuffle_fraction: float = 0.5,
) -> dict[str, int]:
    """Apply the plan to a live session (runtime-settable confs only)."""
    plan = plan_partitions(
        input_bytes,
        spark.sparkContext.defaultParallelism,
        target_partition_bytes,
        shuffle_fraction,
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(plan["maxPartitionBytes"]))
    spark.conf.set("spark.sql.shuffle.partitions", str(plan["shufflePartitions"]))
    return plan


def spread_for_map(df, *cols, min_parts: int | None = None):
    """Ensure a CPU-heavy map stage (tokenize, shingle, decode) runs at
    the cluster's parallelism.

    A single small parquet file scans as ONE task no matter how many
    cores exist (the row group is the split unit, and
    maxPartitionBytes can't split below it), so every expensive
    expression downstream of the scan serializes. AQE coalesces
    partitions down but never splits them up. At deployment scale
    inputs arrive as many splits and this returns the input unchanged —
    the decision checks the ACTUAL scan partition count, so the extra
    shuffle exists only in the degenerate narrow-scan case, where it is
    cheap by construction (the data fit in one task).

    Pass key ``cols`` to hash-partition (stable row placement);
    otherwise round-robin (Spark sorts before round-robin by default,
    so placement is still deterministic).
    """
    from pyspark.sql import functions as F  # noqa: F401 (local import)

    want = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want, *cols) if cols else df.repartition(want)


def plan_gemm_blocks(
    n_vectors: int,
    dim: int,
    task_memory_bytes: int = 512 * MB,
    min_parallel_tasks: int = 32,
) -> int:
    """Block count B for the distributed all-pairs GEMM
    (similarity.cosine_pairs_blocked): per-task memory is ~2·(N/B)
    vectors of float64, so B must satisfy 2·(N/B)·dim·8 ≤ budget; and
    B(B+1)/2 block-pair tasks should cover the cluster's parallelism.
    Replication cost is (B+1)× the corpus, so B is the SMALLEST value
    meeting both bounds, not the largest that fits."""
    bytes_per_vec = dim * 8
    b_mem = max(1, -(-2 * n_vectors * bytes_per_vec // task_memory_bytes))
    b_par = 1
    while b_par * (b_par + 1) // 2 < min_parallel_tasks:
        b_par += 1
    return max(b_mem, b_par)
