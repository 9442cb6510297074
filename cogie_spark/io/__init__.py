from cogie_spark.io.tableio import CheckpointManager, TableIO  # noqa: F401
