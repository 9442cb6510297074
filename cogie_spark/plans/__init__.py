from cogie_spark.plans.linkage import LinkageConfig, run_linkage  # noqa: F401
