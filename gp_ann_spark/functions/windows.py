"""Window helpers.

``bounded_global_window``: a deliberately single-partition window for
BOUNDED dimension tables — shard lists, probe-rank histograms, per-Spark-
partition offset tables, config grids. These are ≤ O(k) or ≤ O(#partitions)
rows *by construction*, so a single-partition sort is correct and cheap.
Partitioning on a NON-FOLDABLE constant keeps that contract explicit in the
physical plan and silences Spark's "No Partition Defined" warning, which
targets unbounded inputs. A plain ``lit(0)`` does NOT work — Catalyst
constant-folds it (and any expression of literals, e.g.
``xxhash64(lit(0))``) to an empty partition spec; the key must reference a
real column. NEVER use this over row-proportional data — that is exactly
the scale-killer the warning exists for.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def bounded_global_window(*order_cols, key=None) -> WindowSpec:
    """``key``: plain column (name or Column, no .asc()/.desc()) to hash for
    the constant partition key; defaults to the first order col. Callers
    ordering by a SortOrder expression MUST pass ``key`` explicitly — a
    SortOrder is Unevaluable inside other expressions."""
    k = key if key is not None else order_cols[0]
    k = k if isinstance(k, Column) else F.col(k)
    # pmod(xxhash64(col), 1) ≡ 0 for every row, but depends on a column so
    # Catalyst cannot fold it away: the single partition stays declared in
    # the plan and the WindowExec warning (noise that buries real
    # regressions in bench logs) is suppressed. One hash per row — free on
    # the bounded inputs this helper is for.
    return Window.partitionBy(F.pmod(F.xxhash64(k), F.lit(1))).orderBy(*order_cols)
