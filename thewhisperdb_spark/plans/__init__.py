from thewhisperdb_spark.plans.jobs import (  # noqa: F401
    relink_by_tags,
    run_clustering,
)
