"""Grouped order statistics (reference analog: the aggregate summaries the
importer's QC stage derives per category — import.sh's picard metrics
stage; generalized to percentiles over any grouped numeric column).

Two variants on purpose (VERDICT r3 #6):

* ``exact=True`` → Spark ``percentile`` (linear interpolation, equals
  DuckDB ``quantile_cont``). **Scale hazard**: the exact aggregator buffers
  EVERY group value in the aggregation buffer — at billions of rows per
  group this is an executor-memory hazard, not just slow. Use only when
  group cardinality is bounded and known.
* ``exact=False`` (default) → ``approx_percentile`` with the
  Greenwald-Khanna sketch: constant memory per group (~accuracy entries),
  rank error ≤ 1/accuracy. For groups smaller than ``accuracy`` the sketch
  holds every value and the result is the EXACT discrete percentile
  (equal to DuckDB ``quantile_disc`` — which is what makes the o3 driver
  gate hash-checkable); past that it degrades gracefully instead of
  OOMing. This is the 100 TB default.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _col_name(prob: float) -> str:
    # 0.5 -> p50, 0.95 -> p95, 0.999 -> p99_9
    pct = prob * 100
    if pct == int(pct):
        return f"p{int(pct)}"
    return "p" + f"{pct:g}".replace(".", "_")


def group_percentiles(
    df: DataFrame,
    value_col: str,
    by: Sequence[str],
    probs: Sequence[float] = (0.5, 0.95),
    exact: bool = False,
    accuracy: int = 10000,
    round_to: int | None = 4,
) -> DataFrame:
    """Per-group percentiles of ``value_col``; one row per group, one
    ``pNN`` column per requested probability. See module docstring for the
    exact-vs-approx memory tradeoff."""
    aggs = []
    for p in probs:
        if exact:
            expr = F.expr(f"percentile({value_col}, {p!r})")
        else:
            expr = F.expr(f"approx_percentile({value_col}, {p!r}, {accuracy})")
        if round_to is not None:
            expr = F.round(expr, round_to)
        aggs.append(expr.alias(_col_name(p)))
    return df.groupBy(*by).agg(*aggs)
