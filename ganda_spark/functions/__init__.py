from ganda_spark.functions.transforms import (  # noqa: F401
    body_output,
    go_json_escape,
    json_envelope,
    plain_output,
    sanitize_filename,
    shard_dir,
)
from ganda_spark.functions.urls import (  # noqa: F401
    canonicalize_url,
    url_hash64,
    url_hash_hex,
    url_host,
)
