"""As-of (nearest-key) join — a time-series operator Spark lacks natively.

The reference has no as-of join of its own; its users reach one only
through DuckDB SQL (``ASOF JOIN``) — noted in SURVEY §2.3 as the one
join family worth adding. pandas-on-Spark ``merge_asof`` exists but
collects per-group to Python; this implementation is pure DataFrame
algebra and scales like any window aggregate.

Technique (the "union trick", one shuffle total):

1. tag both sides and union them on the shared (by, ts) axis;
2. sort within each ``by`` partition by (ts, side-priority) — right
   rows sort BEFORE left rows at equal ts so ``<=`` matches ties;
3. carry the latest right-side payload forward with
   ``last(..., ignorenulls=True)`` over an unbounded-preceding window;
4. keep only left rows; each now holds the most recent right row with
   ``r.ts <= l.ts`` (backward direction; forward is the mirror).

At 100 TB: one hash shuffle on the ``by`` key (same cost as any
groupBy), no per-group Python, no broadcast of either side; skewed
``by`` keys are handled by AQE like any window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance: float | int | None = None,
) -> DataFrame:
    """For each left row, attach the closest right row with
    ``right.on <= left.on`` (backward), ``>=`` (forward), or the
    nearer of the two (``nearest``), optionally matching ``by`` keys
    exactly. Right columns are suffixed; right rows with no match
    contribute nulls (left join semantics).

    Ties on ``on``: the right row at the same instant matches
    (inclusive), mirroring DuckDB's ``ASOF JOIN`` with ``>=``. For
    ``nearest``, an equidistant backward/forward pair resolves to the
    BACKWARD row (pandas ``merge_asof`` leaves this unspecified; a
    deterministic rule keeps the operator oracle-checkable).

    ``tolerance`` bounds the match distance: right rows farther than
    ``tolerance`` from ``left.on`` null out. Measured on the column's
    double cast — native units for numeric columns, SECONDS for
    timestamps (epoch cast), matching pandas' Timedelta semantics.

    ``nearest`` adds a second window ordering over the SAME hash
    partitioning (one extra in-partition sort, no extra shuffle —
    Catalyst reuses the exchange), so every direction stays one
    shuffle total.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    by = [by] if isinstance(by, str) else list(by or [])
    if on not in left.columns or on not in right.columns:
        raise ValueError(f"'on' column {on!r} must exist on both sides")

    right_payload = [c for c in right.columns if c != on and c not in by]
    payload_struct = F.struct(
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_payload],
    )

    l_tagged = left.withColumn(_SIDE, F.lit(1)).withColumn("__rp", F.lit(None).cast(
        "struct<" + ",".join(
            [f"`{on}{suffix}`:{dict(right.dtypes)[on]}"]
            + [f"`{c}{suffix}`:{dict(right.dtypes)[c]}" for c in right_payload]
        ) + ">"
    ))
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(0).alias(_SIDE),
        payload_struct.alias("__rp"),
    )
    # align schemas: left keeps all its columns; right side fills nulls
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tagged.select(*left.columns, _SIDE, "__rp").unionByName(
        r_tagged.select(*left.columns, _SIDE, "__rp")
    )

    wb = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).desc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned
    if direction in ("backward", "nearest"):
        matched = matched.withColumn("__mb", F.last("__rp", ignorenulls=True).over(wb))
    if direction in ("forward", "nearest"):
        matched = matched.withColumn("__mf", F.last("__rp", ignorenulls=True).over(wf))

    def dist(m: Column) -> Column:
        return F.abs(F.col(on).cast("double") - m[f"{on}{suffix}"].cast("double"))

    def within(m: Column) -> Column:
        if tolerance is None:
            return m
        return F.when(dist(m) <= F.lit(float(tolerance)), m)

    if direction == "backward":
        match = within(F.col("__mb"))
    elif direction == "forward":
        match = within(F.col("__mf"))
    else:  # nearest: the closer side; equidistant resolves BACKWARD
        mb, mf = within(F.col("__mb")), within(F.col("__mf"))
        match = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(dist(mb) <= dist(mf), mb)
            .otherwise(mf)
        )
    out = (
        matched.withColumn("__match", match)
        .filter(F.col(_SIDE) == 1)
        .drop(_SIDE, "__rp", "__mb", "__mf")
    )
    return out.select(
        *left.columns, *[F.col("__match")[f"{c}"].alias(c) for c in
                         [f"{on}{suffix}"] + [f"{c}{suffix}" for c in right_payload]]
    )
