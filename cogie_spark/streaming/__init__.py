from cogie_spark.streaming.incremental import (  # noqa: F401
    incremental_link_batch,
    start_incremental_stream,
)
