from meerkat_abacus_spark.plans.pipeline import surveillance_pipeline

__all__ = ["surveillance_pipeline"]
