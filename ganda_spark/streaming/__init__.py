from ganda_spark.streaming.frontier_loop import CrawlDriver  # noqa: F401
