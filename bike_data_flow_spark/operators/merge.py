"""MERGE / upsert / SCD2 — the mutation surface of a warehouse engine,
expressed as pure DataFrame plans over immutable parquet.

Spark has no in-place UPDATE; the lakehouse spelling is MERGE INTO
(Delta/Iceberg) which itself lowers to a join + rewrite. These
operators implement that lowering directly so the engine works on
plain parquet: the result DataFrame is written back with dynamic
partition overwrite (operators/persist.write_table), touching only the
partitions the source actually changed — the same late-file rebuild
machinery the streaming path uses (streaming/pipeline.py).

Scale: one equi-join shuffle on the merge keys (broadcast when the
changeset is small — the overwhelmingly common case: a day's changes
vs years of history); SCD2 is one window over the key partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_MATCH = "_merge_matched"


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    *,
    update_cols: Sequence[str] | None = None,
    delete_condition: Column | None = None,
    broadcast_source: bool = True,
    allow_duplicate_source_keys: bool = False,
) -> DataFrame:
    """SQL-MERGE semantics on DataFrames.

    - WHEN MATCHED: the target row takes the source's ``update_cols``
      (all shared non-key columns by default); a null source value
      keeps the target's (coalesce semantics).
    - WHEN MATCHED AND ``delete_condition`` (evaluated over the
      post-update row): the row is dropped. Unmatched target rows are
      never deleted — this is MERGE, not a retention filter.
    - WHEN NOT MATCHED: the source row is inserted; target columns the
      source lacks become nulls.

    Duplicate source keys would fan every matched target row out once
    per duplicate — SQL MERGE (and Delta) treat that as an error, and
    so does this operator: execution raises unless the caller opts in
    with ``allow_duplicate_source_keys=True``. The check is a window
    count over the (changeset-sized) source, evaluated lazily inside
    the merge plan itself — no extra job.

    Plan: target LEFT JOIN source (source broadcast by default — a
    changeset is normally orders of magnitude smaller than history) +
    UNION ALL of the source's anti-joined inserts. Zero fact-side
    shuffles while the source fits broadcast; one key shuffle after.
    """
    keys = list(keys)
    if update_cols is None:
        update_cols = [c for c in source.columns if c not in keys and c in target.columns]
    key_cols: list[Column] = [F.col(k) for k in keys]
    if not allow_duplicate_source_keys:
        # folded into the JOIN KEYS themselves — they are the one part
        # of the source projection Catalyst can never prune (a guard on
        # a payload/flag column is silently optimized away when that
        # column goes unused, e.g. with no delete_condition)
        dup = F.count(F.lit(1)).over(Window.partitionBy(*keys))
        err = F.concat(
            F.lit("merge_upsert: duplicate source rows for key ("),
            F.concat_ws(", ", *[F.col(k).cast("string") for k in keys]),
            F.lit(") — each target row must match at most one source "
                  "row (pass allow_duplicate_source_keys=True to "
                  "override)"),
        )
        key_cols = [
            F.when(dup > 1, F.raise_error(err)).otherwise(F.col(k)).alias(k)
            for k in keys
        ]
    src = source.select(
        *key_cols,
        *[F.col(c).alias(f"_src_{c}") for c in source.columns if c not in keys],
        F.lit(True).alias(_MATCH),
    )
    if broadcast_source:
        src = F.broadcast(src)
    merged = target.join(src, on=keys, how="left").select(
        *keys,
        *[
            (
                F.coalesce(F.col(f"_src_{c}"), F.col(c)).alias(c)
                if c in update_cols
                else F.col(c)
            )
            for c in target.columns
            if c not in keys
        ],
        F.coalesce(F.col(_MATCH), F.lit(False)).alias(_MATCH),
    )
    if delete_condition is not None:
        merged = merged.filter(~(F.col(_MATCH) & delete_condition))
    inserts = source.join(target.select(keys), on=keys, how="left_anti")
    out_cols = [c for c in target.columns]
    inserts = inserts.select(
        *[
            F.col(c) if c in inserts.columns else F.lit(None).cast(t)
            for c, t in zip(target.columns, [f.dataType for f in target.schema.fields])
        ]
    ).toDF(*out_cols)
    return merged.drop(_MATCH).unionByName(inserts)


def scd2_from_changelog(
    changelog: DataFrame,
    key: str,
    order_by: Sequence[str],
    attrs: Sequence[str],
    *,
    drop_unchanged: bool = True,
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from an append-only
    changelog: one validity-interval row per observed attribute state.

    ``order_by[0]`` is the version timestamp (any extra columns only
    break ties deterministically). ``valid_from`` is the change's own
    timestamp; ``valid_to`` the NEXT change's (null while current).
    With ``drop_unchanged``, rows whose ``attrs`` equal the previous
    row's collapse into the prior interval (lag-filter BEFORE the
    lead, so intervals span the suppressed duplicates).

    Plan: the lag filter and the lead both partition by ``key`` and
    sort by ``order_by`` — one hash partitioning + sort shared by both
    window passes, i.e. a single shuffle for any history length.
    """
    attrs = list(attrs)
    order_cols = [F.asc(c) for c in order_by]
    w = Window.partitionBy(key).orderBy(*order_cols)
    ts = order_by[0]
    df = changelog.select(key, *order_by, *attrs)
    if drop_unchanged:
        # null-safe comparison: a non-null -> NULL attr transition must
        # count as a change (plain != yields NULL there, which filter()
        # drops, silently extending the prior interval). First row per
        # key is detected by row_number, not lag-is-null, so a leading
        # NULL attr value is still handled correctly.
        changed = F.row_number().over(w) == 1
        for a in attrs:
            changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
        df = df.withColumn("_chg", changed).filter(F.col("_chg")).drop("_chg")
    return (
        df.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", F.lead(ts).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(*[c for c in order_by])
    )
