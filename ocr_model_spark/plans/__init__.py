"""Config-driven pipeline composition (profiles)."""

from ocr_model_spark.plans.builder import PROFILES, build_pipeline

__all__ = ["PROFILES", "build_pipeline"]
