"""Temporal composite operators: as-of join, range join, CDC merge.

Spark has no native ASOF JOIN (DuckDB/Polars do — ref users expect one);
the composition here avoids the two naive formulations that die at scale:

* inequality join → BroadcastNestedLoopJoin (O(n·m) comparisons), and
* per-key ``collect_list`` + UDF search (skew-bound, interpreted).

Instead:

* :func:`asof_join` — the **union-window** formulation: both sides are
  unioned into one stream, partitioned by key, sorted by time, and the
  right side's payload is carried forward with ``last(..., ignorenulls)``.
  ONE shuffle (the window's), no join at all, no row explosion; skewed
  keys degrade no worse than any window over the same key.
* :func:`range_join` — the **bucketed** formulation: intervals are
  exploded onto fixed-width time buckets, points equi-join their single
  bucket, and the exact range predicate filters inside the joined bucket.
  Work is proportional to overlaps, never |points| × |intervals|.
* :func:`apply_changes` — Delta-style CDC MERGE (upsert + delete by
  change sequence): latest change per key wins via one window, applied
  over the base with a full outer join.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window, functions as F, types as T

# ---------------------------------------------------------------------- #
# As-of join                                                              #
# ---------------------------------------------------------------------- #


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Optional[Sequence[str]] = None,
    right_prefix: str = "right_",
    tolerance: Optional[int] = None,
    direction: str = "backward",
    forward_prefix: str = "fwd_",
) -> DataFrame:
    """As-of join: for each left row, one temporally-matched right row.

    Directions (Polars ``join_asof`` parity; equality always matches):

    * ``backward`` (default) — latest right with ``right.on <= left.on``
      (DuckDB ``ASOF LEFT JOIN`` semantics).
    * ``forward`` — earliest right with ``right.on >= left.on``.
    * ``nearest`` — whichever of the two is closer; ties prefer backward.
    * ``both`` — backward AND forward matches in one pass: backward
      columns under ``right_prefix``, forward under ``forward_prefix``.
      Same single shuffle as one direction (the second window re-sorts
      the reused exchange).

    All non-``on``/``by`` right columns are carried with ``right_prefix``;
    unmatched left rows keep them NULL.

    Scale shape: both sides are unioned into one keyed stream and the
    right payload is carried inside windows over ONE shuffle on ``by`` —
    no join, no nested loop (`nearest` adds a second sort of the same
    exchange, not a second shuffle). Duplicate right rows per (key, time)
    must be pre-deduplicated by the caller (as-of semantics are undefined
    there — same as DuckDB, which picks an arbitrary one).

    Args:
        on: ordering column name, present in both sides (numeric or
            timestamp; ``nearest`` requires numeric for the distance
            comparison).
        by: equi-join key columns (the partition of the window).
        tolerance: optional max allowed time distance — same units as
            ``on`` for numeric columns, **seconds** for timestamp
            columns; matches farther than this become NULL.
    """
    if direction not in ("backward", "forward", "nearest", "both"):
        raise ValueError(
            "asof_join direction must be 'backward', 'forward', 'nearest' "
            "or 'both'"
        )
    by = list(by or [])
    carry_cols = [c for c in right.columns if c != on and c not in by]

    l_marked = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c != on and c not in by],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in carry_cols],
        F.lit(None).cast(right.schema[on].dataType).alias("__r_t"),
    )
    # A NULL right timestamp would sort NULLS FIRST and its payload would
    # be carried into every row — a NULL-timed observation matches nothing.
    r_marked = right.filter(F.col(on).isNotNull()).select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c != on and c not in by
        ],
        *[F.col(c).alias(f"__r_{c}") for c in carry_cols],
        F.col(on).alias("__r_t"),
    )
    unioned = l_marked.unionByName(r_marked)

    # Backward: right rows (__side=0) sort BEFORE left rows at the same
    # instant, so an equal-timestamp right row is inside the trailing
    # frame — the `<=` of the contract. Forward mirrors it: right rows
    # sort AFTER left at the same instant, leading frame, `>=`.
    w_back = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned
    if direction in ("backward", "nearest", "both"):
        carried = carried.select(
            "*",
            *[
                F.last(f"__r_{c}", ignorenulls=True).over(w_back).alias(f"__b_{c}")
                for c in carry_cols
            ],
            F.last("__r_t", ignorenulls=True).over(w_back).alias("__b_t"),
        )
    if direction in ("forward", "nearest", "both"):
        carried = carried.select(
            "*",
            *[
                F.first(f"__r_{c}", ignorenulls=True).over(w_fwd).alias(f"__f_{c}")
                for c in carry_cols
            ],
            F.first("__r_t", ignorenulls=True).over(w_fwd).alias("__f_t"),
        )

    out = carried.filter(F.col("__side") == 1)

    # Timestamp minus timestamp is a DayTimeInterval, which cannot be
    # compared to a numeric tolerance literal — cast through epoch seconds
    # so `tolerance` means "seconds" for timestamp `on` columns.
    on_is_temporal = isinstance(
        left.schema[on].dataType, (T.TimestampType, T.TimestampNTZType)
    )

    def _valid(side: str) -> Column:
        t = F.col(f"__{side}_t")
        lt = F.col("__t")
        if tolerance is not None and on_is_temporal:
            t, lt = t.cast("double"), lt.cast("double")
        distance = lt - t if side == "b" else t - lt
        ok = F.col(f"__{side}_t").isNotNull()
        if tolerance is not None:
            ok = ok & (distance <= F.lit(tolerance))
        return ok

    fwd_pick = None
    if direction == "both":
        # Both directions from the ONE union + shuffle (the second window
        # re-sorts the same exchange, it does not re-shuffle): backward
        # matches emit under ``right_prefix``, forward under
        # ``forward_prefix`` — replaces running two asof_joins and
        # re-joining their outputs (two shuffles + a join) for callers
        # that want the previous AND next observation per row.
        pick = {c: F.when(_valid("b"), F.col(f"__b_{c}")) for c in carry_cols}
        pick["__out_t"] = F.when(_valid("b"), F.col("__b_t"))
        fwd_pick = {c: F.when(_valid("f"), F.col(f"__f_{c}")) for c in carry_cols}
        fwd_pick["__out_t"] = F.when(_valid("f"), F.col("__f_t"))
    elif direction == "backward":
        pick = {c: F.when(_valid("b"), F.col(f"__b_{c}")) for c in carry_cols}
        pick["__out_t"] = F.when(_valid("b"), F.col("__b_t"))
    elif direction == "forward":
        pick = {c: F.when(_valid("f"), F.col(f"__f_{c}")) for c in carry_cols}
        pick["__out_t"] = F.when(_valid("f"), F.col("__f_t"))
    else:
        # Row-consistent choice: the whole carried row comes from one side.
        use_back = _valid("b") & (
            ~_valid("f")
            | (
                (F.col("__t") - F.col("__b_t"))
                <= (F.col("__f_t") - F.col("__t"))
            )
        )
        pick = {
            c: F.when(use_back, F.col(f"__b_{c}")).otherwise(
                F.when(_valid("f"), F.col(f"__f_{c}"))
            )
            for c in carry_cols
        }
        pick["__out_t"] = F.when(use_back, F.col("__b_t")).otherwise(
            F.when(_valid("f"), F.col("__f_t"))
        )

    projection = [
        *by,
        F.col("__t").alias(on),
        *[F.col(c) for c in left.columns if c != on and c not in by],
        *[pick[c].alias(f"{right_prefix}{c}") for c in carry_cols],
        pick["__out_t"].alias(f"{right_prefix}{on}"),
    ]
    if fwd_pick is not None:
        projection += [
            *[fwd_pick[c].alias(f"{forward_prefix}{c}") for c in carry_cols],
            fwd_pick["__out_t"].alias(f"{forward_prefix}{on}"),
        ]
    return out.select(*projection)


# ---------------------------------------------------------------------- #
# Range join                                                              #
# ---------------------------------------------------------------------- #


def _estimate_bucket_width(
    intervals: DataFrame, start_col: str, end_col: str
) -> int:
    """Deterministic default bucket width: max interval length.

    Max over the FULL table — merge-order-independent, so the chosen
    width (and hence the replication factor and join cost) is a pure
    function of the data, identical across runs. One pruned-two-column
    agg scan; production pipelines should pass ``bucket_width``
    explicitly and skip it.
    """
    row = intervals.agg(
        F.max(F.col(end_col) - F.col(start_col)).alias("mx")
    ).first()
    return int(row["mx"] or 1) or 1


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: Optional[Sequence[str]] = None,
    bucket_width: Optional[int] = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval with ``start <= point < end``.

    Scale shape: a plain inequality join becomes a nested-loop cross
    product in Spark. Here each interval is exploded onto the fixed-width
    buckets it overlaps and each point computes its single bucket, so
    candidates meet in an *equi-join* on (``by``..., bucket) and the exact
    predicate filters within. Each matching pair meets exactly once (a
    point has one bucket), so no dedup pass is needed. Cost is
    ``|intervals| × avg_buckets_per_interval`` replicated rows — pick
    ``bucket_width`` near the typical interval length (default: estimated
    from a 1k-interval sample).

    ``how="left"`` keeps unmatched points with NULL interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError("range_join supports how='inner' or 'left'")
    by = list(by or [])

    if bucket_width is None:
        bucket_width = _estimate_bucket_width(intervals, start_col, end_col)

    # floor (not truncating cast): negative coordinates must round DOWN
    # or points just below zero land in the wrong bucket.
    i_bucketed = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width).cast("long"),
                # end is exclusive, but a point in end's bucket can still
                # precede it — include the end bucket.
                F.floor(F.col(end_col) / bucket_width).cast("long"),
            )
        ),
    )
    p_bucketed = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    cond = [p_bucketed["__bucket"] == i_bucketed["__bucket"]] + [
        p_bucketed[c] == i_bucketed[c] for c in by
    ]
    in_range = (i_bucketed[start_col] <= p_bucketed[point_col]) & (
        p_bucketed[point_col] < i_bucketed[end_col]
    )
    if how == "inner":
        joined = p_bucketed.join(i_bucketed, [*cond, in_range], "inner")
        drop = [i_bucketed[c] for c in by]
        out = joined.drop("__bucket").drop(*drop) if by else joined.drop("__bucket")
        return out
    # left: keep unmatched points — join then null-out non-matches is
    # wrong (a point can match several intervals); use inner + anti union.
    # Anti-join on a surrogate row id, NOT the point columns: NULL never
    # equals NULL, so a matched row containing a NULL would reappear as
    # "unmatched", and shared column names with intervals would be
    # ambiguous.
    tagged = points.withColumn("__pid", F.monotonically_increasing_id())
    tp_bucketed = tagged.withColumn(
        "__bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    cond = [tp_bucketed["__bucket"] == i_bucketed["__bucket"]] + [
        tp_bucketed[c] == i_bucketed[c] for c in by
    ]
    in_range = (i_bucketed[start_col] <= tp_bucketed[point_col]) & (
        tp_bucketed[point_col] < i_bucketed[end_col]
    )
    inner = tp_bucketed.join(i_bucketed, [*cond, in_range], "inner")
    inner = (
        inner.drop("__bucket").drop(*[i_bucketed[c] for c in by])
        if by
        else inner.drop("__bucket")
    )
    matched_ids = inner.select("__pid").distinct()
    unmatched = tagged.join(matched_ids, "__pid", "left_anti")
    for c in intervals.columns:
        if c not in by:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(intervals.schema[c].dataType)
            )
    return inner.unionByName(unmatched).drop("__pid")


# ---------------------------------------------------------------------- #
# CDC merge                                                               #
# ---------------------------------------------------------------------- #


def apply_changes(
    base: Optional[DataFrame],
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: Union[str, Sequence[str]],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Delta-style CDC MERGE: apply a change stream onto a base snapshot.

    For every key, the change with the greatest ``seq_col`` wins —
    ``seq_col`` may be a list for composite ordering (e.g.
    ``["ts", "event_id"]``); callers must make (key, seq) unique, as CDC
    streams are. A winning ``delete_op`` removes the key, anything else
    upserts the row. Keys untouched by the stream keep their base row.
    ``base=None`` materializes a snapshot from the stream alone.

    Scale shape: one window over the changes (partition by key — the same
    shuffle a MERGE would do), then one anti-join against base. Output
    columns are the base/change payload without ``op_col``.
    """
    key_cols = list(key_cols)
    seq_cols = [seq_col] if isinstance(seq_col, str) else list(seq_col)
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # Delete-winning keys are dropped from upserts AND (being "touched")
    # from the base survivors — no separate delete pass needed.
    upserts = latest.filter(F.col(op_col) != delete_op).drop(op_col)

    if base is None:
        return upserts
    survivors = base.join(latest.select(*key_cols), key_cols, "left_anti")
    # Output keeps the base schema; the change stream's bookkeeping columns
    # (seq, anything extra) don't leak into the merged table.
    return survivors.unionByName(upserts.select(*base.columns))
