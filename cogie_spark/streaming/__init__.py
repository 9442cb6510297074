from cogie_spark.streaming.incremental import (  # noqa: F401
    incremental_link_batch,
    start_incremental_stream,
)
from cogie_spark.streaming.corpus import (  # noqa: F401
    incremental_clean_batch,
    start_corpus_stream,
)
