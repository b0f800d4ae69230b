"""Window helpers.

``bounded_global_window``: a deliberately single-partition window for
BOUNDED dimension tables — shard lists, probe-rank histograms, per-Spark-
partition offset tables, config grids. These are ≤ O(k) or ≤ O(#partitions)
rows *by construction*, so a single-partition sort is correct and cheap;
partitioning on a constant makes that contract explicit in the plan and
silences Spark's "No Partition Defined" warning, which targets unbounded
inputs. NEVER use this over row-proportional data — that is exactly the
scale-killer the warning exists for.
"""

from __future__ import annotations

from pyspark.sql import Window, WindowSpec
from pyspark.sql import functions as F


def bounded_global_window(*order_cols) -> WindowSpec:
    return Window.partitionBy(F.lit(0)).orderBy(*order_cols)
