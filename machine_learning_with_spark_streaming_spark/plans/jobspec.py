"""JobSpec — declarative source -> enrich -> normalize -> project pipeline.

The reference drives 19 extract jobs through one interpreter
(``build_jobs`` 19 JobConfig records, pipeline/runner.py:22-178;
``transform_to_final``, pipeline/lib.py:210-298): config-chosen renames,
constants, a mapping join, snapshot stamping, attribute date parsing, and
a final 8-column projection. Here the spec interprets into a single lazy
DataFrame plan — Catalyst sees the whole job and optimizes across the
steps (e.g. the final projection prunes columns all the way into the
scan).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.functions.cleaning import clean_numeric, map_values
from machine_learning_with_spark_streaming_spark.functions.dates import parse_date_multi
from machine_learning_with_spark_streaming_spark.operators.joins import enrich
from machine_learning_with_spark_streaming_spark.operators.validation import conformance_gate
from machine_learning_with_spark_streaming_spark.schemas import FACT_COLUMNS


@dataclass
class MappingSpec:
    """Broadcast enrichment join (the region-mapping xlsx join,
    pipeline/lib.py:188-207)."""

    dim: DataFrame
    on: list[str]
    enriched_cols: dict[str, str]  # dim col -> output col
    not_mapped: str = "NotMapped"


@dataclass
class JobSpec:
    """One feed's declarative normalization recipe."""

    name: str
    # canonical -> candidate source names, resolved first-present (the
    # reference's pick_col / material_candidates, pipeline/lib.py:149-154,
    # runner.py:33) — lets one spec absorb feed schema drift
    col_candidates: dict[str, list[str]] = field(default_factory=dict)
    rename_map: dict[str, str] = field(default_factory=dict)
    constants: dict[str, object] = field(default_factory=dict)
    value_col: str | None = None  # column to clean into `value`
    clean_value: bool = False  # locale-tolerant numeric cleanup
    attribute_col: str | None = None  # text column parsed into `attribute`
    attribute_formats: list[str] | None = None
    snapshot_expr: Column | None = None  # e.g. month-floor of a date col
    mapping: MappingSpec | None = None
    bu_remap: dict[str, str] | None = None
    final_cols: list[str] = field(default_factory=lambda: list(FACT_COLUMNS))


def run_job(feed: DataFrame, spec: JobSpec) -> DataFrame:
    """Interpret a JobSpec over a feed DataFrame -> canonical fact rows.

    Mirrors transform_to_final's step order (pipeline/lib.py:210-298):
    mapping join, snapshot, attribute parse, renames/constants, value
    cleanup, BU remap, final projection + conformance gate.
    """
    df = feed
    if spec.col_candidates:
        from machine_learning_with_spark_streaming_spark.sources.files import resolve_columns

        df = resolve_columns(df, spec.col_candidates)
    if spec.mapping is not None:
        df, _errors = enrich(
            df,
            spec.mapping.dim,
            spec.mapping.on,
            spec.mapping.enriched_cols,
            not_mapped=spec.mapping.not_mapped,
        )
    if spec.snapshot_expr is not None:
        df = df.withColumn("snapshot", spec.snapshot_expr)
    if spec.attribute_col is not None:
        df = df.withColumn(
            "attribute", parse_date_multi(spec.attribute_col, spec.attribute_formats)
        )
    if spec.rename_map:
        df = df.withColumnsRenamed(spec.rename_map)
    for name, value in spec.constants.items():
        df = df.withColumn(name, F.lit(value))
    if spec.value_col is not None:
        src = F.col(spec.value_col)
        df = df.withColumn(
            "value", clean_numeric(src) if spec.clean_value else src.cast("double")
        )
    if spec.bu_remap and "bu" in df.columns:
        df = df.withColumn("bu", map_values("bu", spec.bu_remap))
    df = df.select(
        *[
            F.col(c).cast("string").alias(c)
            if c in ("source", "material", "sales_organization", "country", "bu")
            else F.col(c)
            for c in spec.final_cols
        ]
    )
    return conformance_gate(df, spec.final_cols)


@dataclass
class JobResult:
    """One job's outcome in a runner sweep."""

    name: str
    ok: bool
    rows: int | None = None
    error: str | None = None


def run_jobs(
    feeds: dict[str, DataFrame],
    specs: list[JobSpec],
    sink=None,
    fail_fast: bool = True,
) -> list[JobResult]:
    """EP1's orchestration shape (pipeline/runner.py:180-222): interpret
    each spec over its feed, optionally hand the result to ``sink(name,
    df)``, fail-fast on the first error (the reference aborts the sweep,
    runner.py:202), and return a per-job summary.

    The count that realizes each job doubles as the reference's
    "rows written" log line; with a sink the sink's write is the action
    instead.
    """
    results: list[JobResult] = []
    for spec in specs:
        try:
            out = run_job(feeds[spec.name], spec)
            if sink is not None:
                sink(spec.name, out)
                results.append(JobResult(spec.name, True))
            else:
                results.append(JobResult(spec.name, True, rows=out.count()))
        except Exception as e:  # noqa: BLE001 - summary surface
            results.append(JobResult(spec.name, False, error=f"{type(e).__name__}: {e}"))
            if fail_fast:
                break
    return results
