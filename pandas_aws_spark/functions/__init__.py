"""Column-level function helpers (all JVM-side built-in compositions)."""


def bounded_window_key():
    """Constant partition key for windows over PROVABLY BOUNDED frames
    (post-``limit`` centroid inits, capped query-side guard counts,
    top-k ranks): always evaluates to 0, so the window still sees every
    row in one partition, but the partition spec SURVIVES optimization
    — a plain ``lit(0)`` is stripped by Catalyst's
    ``EliminateWindowPartitions`` (foldable specs), putting the
    ``WindowExec: No Partition Defined`` warning back. Built on
    ``spark_partition_id()`` because nondeterministic expressions are
    exactly the ones the optimizer may not fold. Keeping bounded
    windows OFF the warning channel means a real unpartitioned window
    over unbounded input stands out in any bench/driver tail (r11
    verdict ask #8); the repo-wide plan gate
    (tests/test_plans.py::test_no_unpartitioned_window_over_unbounded_input)
    stays the mechanical check."""
    from pyspark.sql import functions as F

    return F.pmod(F.spark_partition_id(), F.lit(1))
