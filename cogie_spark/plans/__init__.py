from cogie_spark.plans.linkage import LinkageConfig, run_linkage  # noqa: F401
from cogie_spark.plans.corpus import (  # noqa: F401
    CorpusConfig,
    clean_corpus,
    kept_from_docs,
    kept_view,
    near_dup_prune,
)
