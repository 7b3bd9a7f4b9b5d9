from ganda_spark.plans.pipeline import crawl_generation, envelope_output  # noqa: F401
