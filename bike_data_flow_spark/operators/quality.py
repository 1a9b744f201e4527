"""Data-quality validation operator — the Pandera-equivalent (P13).

Reference: processed_data_schema.validate (fail-fast,
processed_all.py:230-239) and enhanced_daily_schema.validate(lazy=True)
(collect-all-failures, enhanced_all.py:86-101); checks declared at
models/stations.py:10-60 and mirrored in schemas.CONSTRAINTS.

Spark-first: every constraint is a Column predicate; ONE aggregate job
counts all violations at once (no per-constraint pass over the data).
Types are checked structurally against the declared StructType — the
operator detects mismatches rather than casting them away
(SURVEY §7.4.6).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..schemas import CONSTRAINTS


class SchemaValidationError(ValueError):
    """Raised when a DataFrame violates its declared schema/constraints."""

    def __init__(self, failures: list[str]):
        self.failures = failures
        super().__init__("schema validation failed:\n  " + "\n  ".join(failures))


@dataclass
class ValidationReport:
    type_failures: list[str] = field(default_factory=list)
    null_failures: dict[str, int] = field(default_factory=dict)
    check_failures: dict[str, int] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return not (self.type_failures or self.null_failures or self.check_failures)

    def messages(self) -> list[str]:
        msgs = list(self.type_failures)
        msgs += [f"column {c!r}: {n} null values (non-nullable)" for c, n in self.null_failures.items()]
        msgs += [f"constraint {c}: {n} violating rows" for c, n in self.check_failures.items()]
        return msgs


def _constraint_predicate(col: str, kind: str, arg) -> Column:
    c = F.col(col)
    if kind == "ge":
        return c >= arg
    if kind == "isin":
        return c.isin(*arg)
    raise ValueError(f"unknown constraint kind {kind!r}")


def validate(
    df: DataFrame,
    schema: StructType,
    constraints: dict[str, list[tuple[str, object]]] | None = None,
    lazy: bool = True,
    strict_order: bool = True,
) -> ValidationReport:
    """Validate df against a declared schema + constraint set.

    lazy=True collects every failure (enhanced path); lazy=False raises
    on the first structural problem (processed path). Always raises
    SchemaValidationError if anything failed; returns the report when
    clean.
    """
    constraints = CONSTRAINTS if constraints is None else constraints
    report = ValidationReport()

    # --- structural checks (driver-side, no job) ---
    actual = {f.name: f.dataType for f in df.schema.fields}
    expected_names = [f.name for f in schema.fields]
    for f_ in schema.fields:
        if f_.name not in actual:
            report.type_failures.append(f"missing column {f_.name!r}")
        elif actual[f_.name].simpleString() != f_.dataType.simpleString():
            report.type_failures.append(
                f"column {f_.name!r}: type {actual[f_.name].simpleString()} "
                f"!= expected {f_.dataType.simpleString()}"
            )
    if strict_order:
        present = [n for n in (f.name for f in df.schema.fields) if n in expected_names]
        want = [n for n in expected_names if n in actual]
        if present != want:
            report.type_failures.append(
                f"column order {present} != expected {want}"
            )
    if report.type_failures and not lazy:
        raise SchemaValidationError(report.messages())

    # --- data checks: one aggregate over all predicates ---
    aggs: list[Column] = []
    names: list[tuple[str, str]] = []
    for f_ in schema.fields:
        if not f_.nullable and f_.name in actual:
            aggs.append(F.count(F.when(F.col(f_.name).isNull(), 1)))
            names.append(("null", f_.name))
    for col, checks in constraints.items():
        if col not in actual:
            continue
        for kind, arg in checks:
            pred = _constraint_predicate(col, kind, arg)
            aggs.append(F.count(F.when(~pred | F.col(col).isNull(), 1)))
            names.append(("check", f"{col} {kind} {arg}"))

    if aggs:
        row = df.agg(*aggs).collect()[0]
        for (kind, label), n in zip(names, row):
            if n and kind == "null":
                report.null_failures[label] = n
            elif n and kind == "check":
                report.check_failures[label] = n

    if not report.ok:
        raise SchemaValidationError(report.messages())
    return report


def observed_validation(
    df: DataFrame,
    schema: StructType,
    constraints: dict[str, list[tuple[str, object]]] | None = None,
    name: str = "validation",
):
    """Attach the constraint scan as an `Observation` instead of a
    dedicated aggregate job.

    `validate()` spends one full pass over the data; at 100 TB that
    second scan costs as much as the write it guards. `df.observe`
    rides the SAME job that consumes the returned DataFrame (typically
    the parquet/Iceberg write): Spark accumulates the violation
    counters task-by-task while the sink runs, so the metrics are free.
    Usage:

        out, obs = observed_validation(df, ENHANCED_SCHEMA)
        out.write.parquet(...)          # one job, metrics piggyback
        raise_on_violations(obs.get)    # driver-side, no extra job

    Structural (type/order) checks stay in `validate()` — they are
    driver-side and jobless either way.
    """
    from pyspark.sql import Observation

    constraints = CONSTRAINTS if constraints is None else constraints
    actual = {f.name for f in df.schema.fields}
    aggs: list[Column] = []
    for f_ in schema.fields:
        if not f_.nullable and f_.name in actual:
            aggs.append(
                F.count(F.when(F.col(f_.name).isNull(), 1)).alias(
                    f"null__{f_.name}"
                )
            )
    for col, checks in constraints.items():
        if col not in actual:
            continue
        for kind, arg in checks:
            pred = _constraint_predicate(col, kind, arg)
            aggs.append(
                F.count(F.when(~pred | F.col(col).isNull(), 1)).alias(
                    f"check__{col}__{kind}"
                )
            )
    if not aggs:
        raise ValueError("nothing to observe: no nullability or constraint checks")
    obs = Observation(name)
    return df.observe(obs, *aggs), obs


def raise_on_violations(metrics: dict) -> None:
    """Turn a non-zero observation metric into SchemaValidationError."""
    bad = {k: v for k, v in metrics.items() if v}
    if bad:
        raise SchemaValidationError(
            [f"constraint {k}: {v} violating rows" for k, v in sorted(bad.items())]
        )
