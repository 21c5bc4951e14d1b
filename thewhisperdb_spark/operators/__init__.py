"""Pure DataFrame -> DataFrame operator library (SURVEY §2 inventory)."""

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def checkpoint_counted(df: DataFrame) -> tuple[DataFrame, int]:
    """Eager localCheckpoint with the row count collected as an
    ``observe`` metric ON the materialization job itself (optimization
    r13): one Spark job where checkpoint-then-isEmpty/count paid two.
    Metrics fire on the checkpoint action (it runs under
    ``Dataset.withAction``), so ``Observation.get`` returns without
    scheduling anything. Used by every micro-batch loop's emptiness gate
    and the iterative kernels' convergence checks (``operators/graph``
    inlines the same pattern with sum metrics)."""
    obs = Observation()
    out = (df.observe(obs, F.count(F.lit(1)).alias("n"))
           .localCheckpoint(eager=True))
    return out, int(obs.get["n"])
