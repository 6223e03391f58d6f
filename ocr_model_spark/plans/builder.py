"""Config-driven pipeline builder: the reference's plugin/profile system
(SURVEY.md §2.11) re-expressed for DataFrames.

Reference: processors are reflected from a package and composed into named
profiles (``worker/pipeline/pipeline_builder.py:37-120``; profiles
``default/performance/quality`` in ``configs/pipeline_config.py:6-37``),
each processor being ``Document -> Document``.

Here a *stage* is a named ``DataFrame -> DataFrame`` function registered in
``STAGES``; a *profile* is an ordered stage list + parameter overrides. The
same three profile names are provided:

  * ``default``     — sniff → extract → rows (the full semantic output);
  * ``performance`` — extract with ``max_pages`` cap semantics and summary
    only (mirrors the reference's fast mode: fewer pages, skip heavy
    derivations — ``document_processor.py:70-84,128-136``);
  * ``quality``     — everything, plus quality scoring columns.

Composition stays LAZY: building a pipeline builds one Catalyst plan, not a
sequence of materializations — the profile system costs nothing at runtime.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

StageFn = Callable[[DataFrame], DataFrame]


def _stage_extract(df: DataFrame) -> DataFrame:
    from ocr_model_spark.operators.extract import extract_pages

    return extract_pages(df)


def _stage_rows(df: DataFrame) -> DataFrame:
    from ocr_model_spark.operators.extract import region_rows

    return region_rows(df)


def _stage_summary(df: DataFrame) -> DataFrame:
    from ocr_model_spark.operators.extract import doc_summary

    return doc_summary(df)


def _stage_quality(df: DataFrame) -> DataFrame:
    from ocr_model_spark.operators.textstats import quality_bucket, quality_score

    score = quality_score(F.col("text_extracted"))
    return df.withColumn("quality", score).withColumn("quality_bucket", quality_bucket(score))


def _stage_salt(df: DataFrame) -> DataFrame:
    from ocr_model_spark.pipeline import salted_repartition

    return salted_repartition(df, df.sparkSession.sparkContext.defaultParallelism * 2)


STAGES: dict[str, StageFn] = {
    "salt_repartition": _stage_salt,
    "extract": _stage_extract,
    "quality": _stage_quality,
    "rows": _stage_rows,
    "summary": _stage_summary,
}

# No profile salts before extract: extraction must run on SCAN partitions —
# a pre-extraction repartition shuffles the fat html payloads and caps
# 4→16-core scaling at 0.58 (measured; see pipeline.run_extraction).
# ``salt_repartition`` stays registered as an OPT-IN stage for host-keyed
# consumers that genuinely need colocated rows (pass via ``extra_stages``
# on a post-extract frame, or ``salt=True`` on run_extraction).
PROFILES: dict[str, list[str]] = {
    "default": ["extract", "rows"],
    "performance": ["extract", "summary"],
    "quality": ["extract", "quality"],
}


def build_pipeline(profile: str = "default", extra_stages: list[str] | None = None) -> StageFn:
    """Compose the named profile into one DataFrame -> DataFrame function.
    Unknown names raise (mirrors the reference's registry validation)."""
    names = PROFILES[profile] + (extra_stages or [])
    missing = [n for n in names if n not in STAGES]
    if missing:
        raise KeyError(f"unknown pipeline stages: {missing}")

    def run(df: DataFrame) -> DataFrame:
        for name in names:
            df = STAGES[name](df)
        return df

    return run
