from ganda_spark.sources.frontier import seed_frontier  # noqa: F401
from ganda_spark.sources.json_lines import parse_json_lines  # noqa: F401
from ganda_spark.sources.url_lines import parse_url_lines  # noqa: F401
