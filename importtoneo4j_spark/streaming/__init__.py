from importtoneo4j_spark.streaming.incremental import (  # noqa: F401
    incremental_extract_stream,
)
