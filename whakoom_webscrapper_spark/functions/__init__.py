"""Column-level function library (built-in expressions first, UDFs last)."""

from whakoom_webscrapper_spark.functions.urls import (  # noqa: F401
    canonicalize_url,
    host_bucket,
    url_hash,
    url_host,
    url_path_segment,
)
