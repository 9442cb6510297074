from cogie_spark.plans.linkage import LinkageConfig, run_linkage  # noqa: F401
from cogie_spark.plans.corpus import CorpusConfig, clean_corpus, kept_view  # noqa: F401
