"""Generic scalable as-of (point-in-time) join.

The reference library never needs a general as-of join — its panels are
pre-aligned on a shared DatetimeIndex (ref utils.py:563-571 aligns factor
and prices by index intersection) — but any production factor pipeline
does: align each observation with the most recent state of another stream
(prices as-of trade time, features as-of label time, reference data as-of
event time). Spark has no built-in ASOF JOIN (pandas ``merge_asof`` and
DuckDB ``ASOF JOIN`` do); the naive Spark encodings are a range join
(nested-loop row-pair expansion) or a per-key ``collect_list`` — both
scale-killers at 100 TB.

This implements the union + ordered-window encoding:

1. tag build (right) rows 0 and probe (left) rows 1,
2. union them on the shared (keys, time) columns, right payload packed
   into one struct column (NULL on probe rows),
3. one window ``last(payload, ignorenulls=True)`` over
   ``partitionBy(keys).orderBy(time, side)`` carries the most recent
   build-side payload forward onto every probe row,
4. keep probe rows and unpack the struct.

Cost: ONE hash shuffle on the join keys (plus the in-partition sort the
window needs) — the same shape as a groupBy, linear in ``|left|+|right|``,
no row-pair expansion, and skew is bounded by the hottest key's combined
row count (salt with :mod:`alphalens_spark.scale.skew` if one key
dominates). AQE coalesces the post-shuffle partitions as usual.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = (),
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance: Column | str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """pandas ``merge_asof`` / DuckDB ``ASOF LEFT JOIN`` semantics on Spark.

    For every left row, attach the single right row with the largest
    ``on`` <= left ``on`` (direction="backward") or the smallest ``on``
    >= left ``on`` ("forward") among rows sharing the ``by`` keys; strict
    inequality when ``allow_exact_matches=False``. Unmatched left rows
    keep NULL right columns (left join). ``tolerance`` (a day-time
    interval Column or SQL interval string like ``"INTERVAL 1 HOUR"``)
    nulls matches farther than the tolerance from the left time — same
    contract as ``merge_asof(tolerance=...)``.

    Right columns are returned as ``<name><suffix>`` when they collide
    with a left column name; the right ``on`` time always comes back as
    ``f"{on}{suffix}"`` so callers can compute staleness. Ties among
    right rows with identical (keys, time) resolve to the one whose
    payload struct sorts last (deterministic given distinct payloads);
    pre-aggregate the right side to one row per (keys, time) when tie
    order matters.

    Works for TIMESTAMP, TIMESTAMP_NTZ, DATE, and numeric ``on`` columns
    alike — ordering and interval comparison only, never epoch extraction
    (TIMESTAMP_NTZ rejects ``unix_micros`` under ANSI; see
    entry_queries.q_event_sessionize).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    by = list(by)
    payload_cols = [c for c in right.columns if c not in by and c != on]
    left_names = set(left.columns)
    out_names = {
        c: (c + suffix if c in left_names else c) for c in payload_cols
    }
    right_on_out = f"{on}{suffix}"

    # Build side first (0) at equal times makes the match inclusive under
    # an ascending (time, side) sort; probe-first (side 0 for left) makes
    # it exclusive. Forward direction scans time descending instead.
    inclusive = allow_exact_matches
    l_side, r_side = (1, 0) if inclusive else (0, 1)

    payload = F.struct(
        F.col(on).alias(right_on_out),
        *[F.col(c).alias(out_names[c]) for c in payload_cols],
    )
    from pyspark.sql import types as T

    left_row_type = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in left.schema.fields]
    )
    r_tagged = (
        right.where(F.col(on).isNotNull())
        .select(
            *[F.col(c) for c in by],
            F.col(on).alias("_asof_t"),
            F.lit(r_side).alias("_asof_side"),
            payload.alias("_asof_payload"),
            F.lit(None).cast(left_row_type).alias("_asof_row"),
        )
    )
    l_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_asof_t"),
        F.lit(l_side).alias("_asof_side"),
        F.lit(None)
        .cast(r_tagged.schema["_asof_payload"].dataType)
        .alias("_asof_payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_asof_row"),
    )

    t_order = (
        [F.col("_asof_t").asc_nulls_first(), F.col("_asof_side").asc()]
        if direction == "backward"
        else [F.col("_asof_t").desc_nulls_first(), F.col("_asof_side").asc()]
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(*t_order, F.col("_asof_payload").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        r_tagged.unionByName(l_tagged)
        .withColumn("_asof_match", F.last("_asof_payload", ignorenulls=True).over(w))
        .where(F.col("_asof_side") == l_side)
    )

    match = F.col("_asof_match")
    if tolerance is not None:
        tol = F.expr(tolerance) if isinstance(tolerance, str) else tolerance
        gap = (
            F.col("_asof_t") - match[right_on_out]
            if direction == "backward"
            else match[right_on_out] - F.col("_asof_t")
        )
        match = F.when(gap <= tol, match)

    return merged.select(
        *[F.col("_asof_row")[c].alias(c) for c in left.columns],
        match[right_on_out].alias(right_on_out),
        *[match[out_names[c]].alias(out_names[c]) for c in payload_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    how: str = "inner",
    max_span_days: int | None = 3660,
) -> DataFrame:
    """Point-in-interval join — which interval contains each point — as a
    day-bucketed EQUI-join instead of the nested-loop range join Spark
    would otherwise plan (the §4.2 rewrite, generalized to public API;
    event studies and the positions operator embed the same shape).

    1. intervals explode to the calendar days they cover (fan-out =
       interval length in days — bounded for session/holding-style
       intervals; pick the bucketing to match your span distribution),
    2. points key by their single day,
    3. hash join on (by…, day) then verify the exact containment
       predicate start <= t <= end.

    A point has exactly ONE day bucket, so no post-join dedup is needed.
    Day bucketing via ``to_date`` is valid for TIMESTAMP and
    TIMESTAMP_NTZ alike (no epoch extraction). ``how='left'`` keeps
    unmatched points with NULL interval columns (one extra anti-join —
    matched-set complement — not an outer range join).

    The day fan-out is each interval's span in days, so one open-ended
    interval (a "still active" row with a sentinel end far in the
    future) would explode to ~unbounded rows; ``max_span_days``
    (default 10 years) turns that silent blowup into an executor-side
    error naming the offending span — pass ``None`` only when spans are
    known-bounded upstream, or coarsen the bucketing for long intervals.

    Output: points columns + the matched interval's columns.
    """
    keys = list(by)
    p = points.withColumn("_day", F.to_date(F.col(point_ts)))
    end_day = F.to_date(F.col(end_col))
    if max_span_days is not None:
        span = F.datediff(end_day, F.to_date(F.col(start_col))) + 1
        end_day = F.when(span <= max_span_days, end_day).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "interval_join: interval span exceeds "
                        f"max_span_days={max_span_days} ("
                    ),
                    span.cast("string"),
                    F.lit(
                        " days): bound the span upstream or raise "
                        "max_span_days explicitly"
                    ),
                )
            ).cast("date")
        )
    ivl = intervals.withColumn(
        "_day",
        F.explode(
            F.sequence(F.to_date(F.col(start_col)), end_day)
        ),
    )
    cond = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
    )
    matched = p.join(ivl, keys + ["_day"]).where(cond).drop("_day")
    if how == "inner":
        return matched
    if how != "left":
        raise ValueError("how must be 'inner' or 'left'")
    missing = p.join(
        matched.select(*points.columns).dropDuplicates(points.columns),
        points.columns,
        "left_anti",
    ).drop("_day")
    for c in matched.columns:
        if c not in missing.columns:
            missing = missing.withColumn(c, F.lit(None))
    return matched.unionByName(missing.select(*matched.columns))


def keyed_bloom(
    df: DataFrame,
    key_cols: Sequence[str],
    n_bits: int = 1 << 16,
    depth: int = 4,
) -> DataFrame:
    """Build a Bloom filter over ``key_cols`` as ONE ROW holding a
    map<word, 64-bit mask> — pure built-in expressions (xxhash64 +
    bit_or), so it computes distributed, broadcasts in O(n_bits/8)
    bytes, and has the no-false-negative guarantee by construction.

    depth hash positions per key: pos_i = xxhash64(i, key) mod n_bits;
    word = pos div 64, mask bit = pos mod 64. groupBy(word) bit_or is
    map-side combinable; the map never exceeds n_bits/64 entries.
    """
    return (
        bloom_words(df, key_cols, n_bits=n_bits, depth=depth)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("word", "bits"))
            ).alias("_bf")
        )
    )


def bloom_words(
    df: DataFrame,
    key_cols: Sequence[str],
    n_bits: int = 1 << 16,
    depth: int = 4,
) -> DataFrame:
    """The Bloom filter as (word, bits) ROWS — :func:`keyed_bloom`'s
    pre-map form, shared with the streaming Bloom store (parquet-
    friendly, and two filters over the same hash family merge by
    groupBy(word) bit_or — set union, the bit-OR store algebra)."""
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    ex = df.select(key.alias("_k")).select(
        "_k", F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("_i")
    )
    pos = F.pmod(F.xxhash64(F.col("_i"), F.col("_k")), F.lit(n_bits))
    words = ex.select(pos.alias("_pos")).select(
        (F.col("_pos") / 64).cast("int").alias("word"),
        # shiftleft by a COLUMN needs the SQL form (the Python helper
        # only takes a literal shift amount)
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").alias(
            "bit"
        ),
    )
    return words.groupBy("word").agg(F.bit_or("bit").alias("bits"))


def bloom_prune(
    big: DataFrame,
    bf: DataFrame,
    on: Sequence[str],
    n_bits: int = 1 << 16,
    depth: int = 4,
) -> DataFrame:
    """Rows of ``big`` whose key MAY be in the Bloom filter ``bf``
    (keyed_bloom's 1-row map form) — no false negatives; false
    positives ride through to whatever verification follows. The probe
    half of :func:`bloom_filtered_join`, shared with the streaming
    Bloom store's readout."""
    on = list(on)
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in on])
    probe = big.crossJoin(F.broadcast(bf)).withColumn("_k", key)
    hit = None
    for i in range(depth):
        probe = probe.withColumn(
            f"_pos{i}",
            F.pmod(F.xxhash64(F.lit(i), F.col("_k")), F.lit(n_bits)),
        )
        t = F.coalesce(
            F.expr(
                # try_element_at: a missing word is NULL (-> no hit) in
                # BOTH ANSI and non-ANSI sessions; plain element_at
                # throws under the driver's ANSI default
                f"try_element_at(_bf, CAST(_pos{i} / 64 AS INT)) "
                f"& shiftleft(CAST(1 AS BIGINT), CAST(_pos{i} % 64 AS INT))"
            )
            != 0,
            F.lit(False),
        )
        hit = t if hit is None else (hit & t)
    return probe.where(hit).drop(
        "_bf", "_k", *[f"_pos{i}" for i in range(depth)]
    )


def bloom_filtered_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_bits: int = 1 << 16,
    depth: int = 4,
) -> DataFrame:
    """Equi-join with a Bloom pre-filter on the big side — the classic
    100 TB shuffle reducer: when ``small`` matches only a fraction of
    ``big``'s keys, most big-side rows can be discarded BEFORE the join
    shuffle by probing a broadcast Bloom of the small side's keys.

    Result is row-identical to ``big.join(small, on, how)`` (Bloom
    filters have no false negatives; false positives just ride through
    to the real join and fall out there). Supported ``how``: inner /
    left_semi — shapes where dropping non-matching big rows early is
    legal. The filter is a 1-row broadcast (n_bits/8 bytes ≪ the small
    side itself) probed with O(depth) constant-time bit tests per row —
    cheaper than broadcasting ``small`` when the small side is below
    shuffle-join size but above broadcast size.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"how={how!r}: Bloom pre-filtering only preserves inner/left_semi"
        )
    on = list(on)
    bf = keyed_bloom(small, on, n_bits=n_bits, depth=depth)
    filtered = bloom_prune(big, bf, on, n_bits=n_bits, depth=depth)
    return filtered.join(small, on, how)
