"""Temporal joins over event streams.

The reference's domain has no time axis, but a transcript/event corpus at
100 TB does, and the training-data pipelines this engine targets need the
classic temporal operator the DataFrame API lacks: the **as-of join**
("latest right row at or before each left row's timestamp, per key").

Spark-first formulation — a composition of native ops, NOT a range
cross-join and NOT a UDF:

    tag sides -> unionByName -> one shuffle on the key ->
    last(right_payload, ignorenulls) over
        (partitionBy key ORDER BY ts, side ROWS UNBOUNDED PRECEDING..CURRENT)
    -> keep left rows

Cost: exactly one shuffle + per-key sort (the minimum any as-of needs);
no row expansion at any point, so a 10^12-row left side never materializes
candidate pairs. A right row at the same timestamp as a left row matches
(>= semantics), which is also DuckDB's ASOF JOIN contract — that is what
makes the operator oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Spark's sort rejects MapType anywhere in a sort key."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    right_prefix: str = "r_",
    how: str = "left",
    tolerance_sec: float | None = None,
    dedup_col: str | None = None,
) -> DataFrame:
    """For each left row: the right row with the greatest right_ts <=
    left_ts in the same key group (ties on timestamp: the right row wins,
    i.e. equal timestamps match).

    right_cols: payload columns carried from the matched right row (default
    all non-key, non-ts), emitted as ``{right_prefix}{col}``; the matched
    timestamp is emitted as ``{right_prefix}{right_ts}``. how='left' keeps
    unmatched left rows (payload NULL); how='inner' drops them.
    tolerance_sec bounds the lookback (older matches become NULL/dropped).

    Right-side (key, ts) duplicates: pass ``dedup_col`` (a small orderable
    right column — an id, a sequence number) and the duplicate with the
    greatest value wins, paying a one-column comparator instead of a
    whole-payload one. Without it, the full payload struct is the tiebreak
    when every carried column is orderable (deterministic, wide comparator);
    if the payload contains an unorderable type (MapType), no tiebreak is
    applied and the winner among exact (key, ts) right duplicates is
    plan-dependent — supply dedup_col to restore determinism.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rcols = right_cols or [c for c in right.columns if c not in keys + [right_ts]]
    pay = F.struct(
        F.col(right_ts).cast("timestamp").alias("_rts"),
        *[F.col(c) for c in rcols],
    )
    r = right.select(
        *keys,
        F.col(right_ts).cast("timestamp").alias("_ts"),
        pay.alias("_rpay"),
        F.lit(0).alias("_side"),
    )
    l_tagged = (
        left.withColumn("_ts", F.col(left_ts).cast("timestamp"))
        .withColumn("_side", F.lit(1))
    )
    u = r.unionByName(l_tagged, allowMissingColumns=True)
    if dedup_col is not None:
        if dedup_col not in rcols:
            raise ValueError(f"dedup_col {dedup_col!r} is not a carried right column")
        tie = [F.col("_rpay").getField(dedup_col).asc()]
    elif all(_orderable(right.schema[c].dataType) for c in rcols):
        tie = [F.col("_rpay").asc()]
    else:
        tie = []  # unorderable payload, no dedup_col: documented caveat
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), *tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = F.last("_rpay", ignorenulls=True).over(w)
    if tolerance_sec is not None:
        lo = F.col("_ts") - F.expr(f"INTERVAL {float(tolerance_sec)} SECONDS")
        m = F.when(m["_rts"] >= lo, m)
    out = (
        u.withColumn("_m", m)
        .filter(F.col("_side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            F.col("_m._rts").alias(f"{right_prefix}{right_ts}"),
            *[F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in rcols],
        )
    )
    if how == "inner":
        out = out.filter(F.col(f"{right_prefix}{right_ts}").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    return out


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair with
    start <= ts < end (half-open) — the temporal containment join the
    DataFrame API lacks (round 4; sibling of asof_join).

    Spark-first formulation — an EQUI-join on time bins, never an
    inequality-only join (which Catalyst can only execute as a broadcast
    nested loop — quadratic and broadcast-bounded):

        points  gain _bin = floor(epoch / bin_seconds)
        intervals explode to every bin they cover (sequence + explode)
        equi-join on _bin, then the exact start<=ts<end filter

    Cost: one shuffle on _bin each side; an interval duplicates into
    ceil(length / bin_seconds) + 1 rows, so choose bin_seconds near the
    typical interval length (duplication factor ~2). Hot bins (many
    overlapping intervals) are ordinary join skew — AQE's skew-join
    split applies; there is no quadratic blowup unless many long
    intervals genuinely overlap many points, which is the true output
    size. ``how='left_semi'`` returns just the points that fall in any
    interval (dedup-free)."""
    if how not in ("inner", "left_semi"):
        raise ValueError(f"how must be 'inner' or 'left_semi', got {how!r}")
    epoch = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    p = points.withColumn(
        "_bin", F.floor(epoch(ts_col) / F.lit(bin_seconds))
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(epoch(start_col) / F.lit(bin_seconds)),
                # end is exclusive, but the cheap inclusive bound only adds
                # at most one bin per interval; the exact filter below
                # removes any false candidate it admits
                F.floor(epoch(end_col) / F.lit(bin_seconds)),
            )
        ),
    )
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    if how == "left_semi":
        # points inside ANY interval, each point once: a true semi-join on
        # (bin equality AND containment) — no pair materialization
        iv_slim = iv.select(
            F.col("_bin").alias("_ibin"),
            F.col(start_col).alias("_istart"),
            F.col(end_col).alias("_iend"),
        )
        semi_cond = (
            (F.col("_bin") == F.col("_ibin"))
            & (F.col(ts_col) >= F.col("_istart"))
            & (F.col(ts_col) < F.col("_iend"))
        )
        return p.join(iv_slim, semi_cond, "left_semi").drop("_bin")
    return p.join(iv, "_bin").filter(cond).drop("_bin")
