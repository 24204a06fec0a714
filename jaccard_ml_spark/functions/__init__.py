"""Column-level functions (all JVM-side expressions or Arrow pandas UDFs)."""

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round6(col: Column) -> Column:
    """Engine-independent 6-dp rounding: floor(x·1e6 + 0.5)/1e6.

    ``round()`` half-way behavior differs between engines (Spark
    HALF_UP vs DuckDB); this formula is pure double arithmetic, so any
    engine computing the same double rounds to the same value — needed
    for the differential oracle checks (the reference dodges this class
    of problem with its 1e-3 tolerance, src/utils.cuh:655; we prefer
    exact equality).
    """
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
