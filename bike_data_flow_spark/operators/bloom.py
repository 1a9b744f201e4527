"""Distributed Bloom filter built from DataFrame primitives.

Spark's own `bloom_filter_agg` exists only inside Catalyst's runtime
join-filter rule (it is not in the public function registry), so the
engine exposes the same capability as two composable operators built
entirely from codegen-friendly built-ins:

- ``bloom_build``   — aggregate a column into a one-row bitmap:
  k hash positions per value (Kirsch–Mitzenmacher double hashing over
  two xxhash64 seeds), each position becomes a (word, bit) pair,
  ``bit_or`` folds them per 64-bit word map-side, and the dense
  ``array<long>`` bitmap materializes in a final single-row aggregate
  whose input is at most num_bits/64 rows — the bitmap itself, NOT the
  data, bounds the last stage.
- ``with_bloom_flag`` — probe: broadcast the one-row bitmap, test all
  k bits with element_at + shift/AND expressions. Wholly map-side: no
  shuffle, no state, each probe row costs k word lookups.

Why this matters at 100 TB: membership tests against a small reference
set (an eval-benchmark shingle list, a deny-list, "already ingested"
keys) are usually spelled as a broadcast semi-join, which broadcasts
the *keys themselves* (gigabytes for a 10⁸-key set). The bloom bitmap
is fixed-size (num_bits/8 bytes — 256 KB at the default 2²¹ bits)
regardless of key count, trades that for a tunable false-positive rate
(~(kn/m)^k, ≈1e-5 at n=30k defaults), and guarantees NO false
negatives, so it is safe as a pre-filter with exact re-verification of
the survivors (the same prefilter-then-verify contract as the LSH
operators in dedup.py/similarity.py).

No reference counterpart (seszele64/bike-data-flow has no membership
machinery); this extends the engine per SURVEY §2's training-data
charter the same way the dedup/ANN operators do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS_DEFAULT = 1 << 21  # 256 KB bitmap
BLOOM_K_DEFAULT = 4


def _positions(value: Column, num_bits: int, k: int) -> list[Column]:
    """k bit positions via double hashing: pos_i = (h1 + i*h2) mod m.

    h2 is forced odd so the k probes never collapse onto one position
    (an even h2 with a power-of-two m halves the effective positions).
    Both hashes are reduced mod m BEFORE the affine combination —
    (h1 + i·h2) mod m is unchanged, and the intermediate sum stays
    < (k+1)·m, so ANSI mode can never see a long overflow.
    """
    h1 = F.pmod(F.xxhash64(value), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(value, F.lit(1)), F.lit(num_bits)).bitwiseOR(F.lit(1))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(num_bits)) for i in range(k)]


def bloom_build(
    df: DataFrame,
    value: Column,
    num_bits: int = BLOOM_BITS_DEFAULT,
    k: int = BLOOM_K_DEFAULT,
) -> DataFrame:
    """Aggregate `value` over df into a one-row [bloom: array<long>].

    Plan: explode k positions per row (map-side), partial bit_or per
    word before the only shuffle (at most num_bits/64 = 32k groups at
    defaults, regardless of input size), then one single-row aggregate
    assembles the dense word array. The result row is the broadcast
    object for `with_bloom_flag`.
    """
    nwords = num_bits // 64
    pos = df.select(F.explode(F.array(*_positions(value, num_bits, k))).alias("pos"))
    masks = pos.select(
        F.expr("cast(pos div 64 AS int)").alias("word"),
        F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("mask"),
    )
    # union the full zero-filled word domain so every word index exists:
    # the final collect_list is dense and array_sort puts it in word
    # order — an O(n log n) assembly. (The tempting alternative — gap
    # fill via transform(sequence, i -> element_at(map, i)) — is
    # accidentally quadratic: element_at on a MapType is a linear scan,
    # 32k × 32k ≈ 10⁹ comparisons for a single row.)
    zeros = df.sparkSession.range(nwords).select(
        F.col("id").cast("int").alias("word"), F.lit(0).cast("long").alias("mask")
    )
    words = (
        masks.unionByName(zeros)
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    return words.agg(
        F.array_sort(F.collect_list(F.struct("word", "bits"))).alias("_e")
    ).select(F.transform(F.col("_e"), lambda e: e["bits"]).alias("bloom"))


def with_bloom_flag(
    df: DataFrame,
    bloom_df: DataFrame,
    value: Column,
    num_bits: int = BLOOM_BITS_DEFAULT,
    k: int = BLOOM_K_DEFAULT,
    flag: str = "in_bloom",
) -> DataFrame:
    """df + boolean `flag`: does `value` hit all k bloom bits?

    The one-row bitmap is broadcast (BroadcastNestedLoopJoin on a
    single row — no shuffle of df) and consumed inside the same fused
    projection, so the k bit tests are plain long arithmetic in
    whole-stage codegen and the array itself never materializes into
    output rows. (Inlining the bitmap as an F.lit array literal is the
    tempting alternative and a trap: a 32k-element Python list crosses
    py4j element-by-element — ~14 s to even BUILD the Column — and the
    giant expression tree then taxes every plan serialization.) False
    positives possible at the configured rate, false negatives never.
    """
    probed = df.crossJoin(F.broadcast(bloom_df))
    pcols = [f"_p{i}" for i in range(k)]
    probed = probed.select(
        "*", *[p.alias(n) for n, p in zip(pcols, _positions(value, num_bits, k))]
    )
    cond = F.lit(True)
    for n in pcols:
        cond = cond & F.expr(
            f"(element_at(bloom, cast({n} div 64 AS int) + 1)"
            f" & shiftleft(1L, cast({n} % 64 AS int))) != 0L"
        )
    return probed.withColumn(flag, cond).drop("bloom", *pcols)
