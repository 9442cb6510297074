from cogie_spark.fixtures.codefiles import (  # noqa: F401
    code_files,
    labeled_pairs,
)
