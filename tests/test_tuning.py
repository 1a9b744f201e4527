from __future__ import annotations

from bike_data_flow_spark.tuning import (
    GB,
    MB,
    dir_bytes,
    plan_partitions,
    tune_session,
)


def test_plan_small_input_sizes_to_data_not_cores():
    # 60 MB in -> 30 MB shuffled: 4 reducers of ~8 MB each, NOT all 8
    # cores (a reducer that sees <8 MB costs more to schedule than run)
    plan = plan_partitions(60 * MB, default_parallelism=8)
    assert plan["shufflePartitions"] == 4
    assert plan["expectedScanTasks"] == 1
    # ...but data large enough to feed every core uses them all
    assert plan_partitions(10 * GB, default_parallelism=8)["shufflePartitions"] >= 8
    # and truly tiny input collapses to one reducer
    assert plan_partitions(1 * MB, default_parallelism=8)["shufflePartitions"] == 1


def test_plan_100tb_input():
    plan = plan_partitions(100 * 1024 * GB, default_parallelism=8000)
    # 100 TB / 128 MB ≈ 819k scan tasks; shuffle capped at the ceiling
    assert plan["expectedScanTasks"] == 819200
    assert plan["shufflePartitions"] == 20000


def test_tune_session_applies_and_reports(spark, tmp_path):
    (tmp_path / "x.bin").write_bytes(b"\0" * 1024)
    assert dir_bytes(tmp_path) == 1024
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        plan = tune_session(spark, 10 * GB)
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(
            plan["shufflePartitions"]
        )
        assert plan["shufflePartitions"] >= spark.sparkContext.defaultParallelism
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_plan_gemm_blocks_bounds():
    from bike_data_flow_spark.tuning import MB, plan_gemm_blocks

    # toy corpus: parallelism-bound (B(B+1)/2 >= 32 -> B = 8)
    assert plan_gemm_blocks(5000, 64) == 8
    # big corpus: memory-bound -- 2*(N/B)*dim*8 must fit the budget
    n, dim, budget = 10**8, 64, 512 * MB
    b = plan_gemm_blocks(n, dim, budget)
    assert 2 * (n / b) * dim * 8 <= budget
    # and B is minimal: one block fewer would blow the budget
    assert 2 * (n / (b - 1)) * dim * 8 > budget
