"""Structured Streaming queries, each hash-matched to its batch oracle.

Registered into the shared REGISTRY; ordering and the driver window
live in pydala2_spark/queries/__init__.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pydala2_spark.queries._base import (
    _DEC,
    _app_scoped_tmp,
    _dsum,
    _oavg,
    _osum,
    _t,
    query,
)
from pydala2_spark.sources.testdata import read_table



@query(
    "stream_hourly_rollup",
    f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           event_type,
           count(*) AS n_events,
           {_osum("value")} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Structured Streaming end-to-end, oracle-checked: drain
    # events.parquet through readStream → watermarked tumbling-window
    # agg → memory sink with availableNow, then hand the driver the
    # drained table. Proves the streaming rollup converges to the
    # batch/SQL answer on a finite input — the incremental path and
    # the batch path agree.
    import os
    import tempfile
    import uuid

    from pydala2_spark.streaming.pipeline import (
        hourly_rollup_stream,
        read_event_stream,
        run_to_memory,
    )

    events = read_event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    rollup = hourly_rollup_stream(events).select(
        "hour", "event_type", "n_events", "total_value"
    )
    name = f"rollup_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix=f"ck_{name}_")
    # state = O(hours x event_types) — a handful of partitions is
    # plenty and cuts per-batch state-store file IO 8x vs the session's
    # batch shuffle setting
    return run_to_memory(rollup, name, ck, state_partitions=4)



@query(
    "stream_sessionization",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps
    )
    SELECT user_id,
           count(DISTINCT session_id) AS n_sessions,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id
    """,
)
def stream_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    # custom STATEFUL streaming operator, oracle-checked end-to-end:
    # applyInPandasWithState gap sessionizer drained with availableNow
    # must converge to the batch window-SQL answer on a finite input —
    # proving the incremental state machine implements the same
    # semantics as the declarative form (ev_sessionization).
    import os
    import tempfile
    import uuid

    from pydala2_spark.streaming.pipeline import (
        read_event_stream,
        run_to_memory,
        sessionize_stream,
    )

    events = read_event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    sess = sessionize_stream(events)
    name = f"sessionize_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix=f"ck_{name}_")
    # state = one tuple per user — a handful of state partitions is plenty
    return run_to_memory(sess, name, ck, state_partitions=4)



@query(
    "stream_dedup_ingest",
    f"""
    SELECT event_type, count(*) AS n_events, {_osum("value")} AS total_value
    FROM events GROUP BY event_type
    """,
)
def stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exactly-once ingest under at-least-once delivery, end to end:
    # the landing zone gets the SAME events file delivered twice
    # (retried upload); readStream → watermarked dropDuplicates on
    # event_id → per-type rollup must converge to the single-copy
    # batch answer. Third streaming oracle query (rollup,
    # sessionization, now the dedup guard) — the state store holds one
    # entry per event_id inside the watermark horizon, the standard
    # ingest guard in front of an append-only corpus.
    import os
    import shutil
    import tempfile
    import uuid

    from pydala2_spark.streaming.pipeline import (
        dedup_stream,
        read_event_stream,
        run_to_memory,
    )

    src = os.path.join(sf_dir, "events.parquet")
    zone = tempfile.mkdtemp(prefix="dupzone_")

    # the driver's testdata ships events as ONE file; a synthetic
    # scaled corpus (scripts/scaling_check.py) writes a directory of
    # part files — deliver either shape, twice
    def _deliver(tag: str) -> None:
        if os.path.isdir(src):
            parts = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
            for i, f in enumerate(parts):
                shutil.copy(os.path.join(src, f), os.path.join(zone, f"{tag}_{i}.parquet"))
        else:
            shutil.copy(src, os.path.join(zone, f"{tag}.parquet"))

    _deliver("a")
    _deliver("b")  # duplicate delivery
    events = read_event_stream(spark, zone)
    deduped = dedup_stream(events, ["event_id"], watermark="90 days")
    agg = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        _dsum("value").alias("total_value"),
    )
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix=f"ck_{name}_")
    return run_to_memory(agg, name, ck, state_partitions=4)



@query(
    "stream_cms_counters",
    """
    WITH rows_ AS (SELECT unnest(range(3)) AS row_id)
    SELECT row_id,
           ('0x' || substr(md5('cms' || CAST(row_id AS VARCHAR) || ':'
              || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 512 AS bucket,
           count(*) AS cnt
    FROM events CROSS JOIN rows_
    GROUP BY 1, 2
    """,
)
def stream_cms_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Streaming sketch maintenance, end to end: readStream over the
    # landing zone → Count-Min counter aggregation → complete-mode
    # drain. The streamed counter table must equal the batch
    # cms_build bit-for-bit (counter addition is associative), and —
    # the scale point — state is bounded at depth x width rows FOREVER,
    # no watermark needed. Fourth streaming oracle query. See
    # streaming/pipeline.cms_stream.
    import tempfile
    import uuid

    from pydala2_spark.streaming.pipeline import (
        cms_stream,
        read_event_stream,
        run_to_memory,
    )

    src = f"{sf_dir}/events.parquet"
    events = read_event_stream(spark, src)
    counters = cms_stream(events, "user_id", depth=3, width=512)
    name = f"cms_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix=f"ck_{name}_")
    return run_to_memory(
        counters, name, ck, state_partitions=4, output_mode="complete"
    )



def _stream_hll_oracle() -> str:
    from pydala2_spark.functions.sketch import hll_oracle_sql

    inner = hll_oracle_sql("events", "event_type", "user_id", p=7)
    return (
        "SELECT event_type, hll_estimate, n_registers_hit "
        f"FROM ({inner})"
    )



@query("stream_hll_distinct", _stream_hll_oracle())
def stream_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Seventh streaming oracle query: per-type distinct-user
    # HyperLogLog maintained as streaming max-rho register state
    # (algebraic, bounded at |types| x 128 rows forever, no
    # watermark); the drained registers fold to the batch estimate
    # bit-for-bit. See streaming/pipeline.hll_stream and
    # functions/sketch.hll_estimate_from_registers.
    import tempfile
    import uuid

    from pydala2_spark.functions.sketch import hll_estimate_from_registers
    from pydala2_spark.streaming.pipeline import (
        hll_stream,
        read_event_stream,
        run_to_memory,
    )

    events = read_event_stream(spark, f"{sf_dir}/events.parquet")
    regs = hll_stream(events, "event_type", "user_id", p=7)
    name = f"hll_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix=f"ck_{name}_")
    drained = run_to_memory(
        regs, name, ck, state_partitions=4, output_mode="complete"
    )
    return hll_estimate_from_registers(drained, "event_type", p=7)



@query(
    "stream_ohlc_bars",
    f"""
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
           round(min(struct_pack(t := ts, i := event_id, v := value)).v, 2)
             AS "open",
           round(max(value), 2) AS high_,
           round(min(value), 2) AS low_,
           round(max(struct_pack(t := ts, i := event_id, v := value)).v, 2)
             AS "close",
           {_oavg("value")} AS mean_value,
           count(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fifth streaming oracle query: the OHLC time-bar aggregation run
    # as a Structured Streaming job (struct MIN/MAX and decimal sums
    # are all algebraic, so the streaming state is one partial per
    # (type, bucket) — bounded by the key space, and the drained
    # result equals the batch ohlc_bars bit-for-bit).
    import tempfile
    import uuid

    from pydala2_spark.operators.events import ohlc_bars
    from pydala2_spark.streaming.pipeline import read_event_stream, run_to_memory

    events = read_event_stream(spark, f"{sf_dir}/events.parquet")
    bars = ohlc_bars(events, freq="hour")
    name = f"ohlc_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix=f"ck_{name}_")
    return run_to_memory(bars, name, ck, state_partitions=4, output_mode="complete")



def _stream_kmv_quantiles_oracle() -> str:
    from pydala2_spark.functions.sketch import sample_quantile_oracle_sql

    return sample_quantile_oracle_sql(
        "events",
        "event_type",
        "event_id",
        "value",
        k=128,
        qs={"p50_est": 0.5, "p90_est": 0.9, "p99_est": 0.99},
    )



@query("stream_kmv_quantiles", _stream_kmv_quantiles_oracle())
def stream_kmv_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eighth streaming oracle query: the uniform-sample quantile
    sketch maintained as CUSTOM BOUNDED STATE — per event type,
    ``applyInPandasWithState`` keeps the k=128 smallest-hash rows seen
    so far (O(k) per group forever, no watermark), and because a
    bottom-k is a pure function of the row SET, the drained state
    equals the batch sketch bit-for-bit regardless of how micro-batches
    split the input. The oracle recomputes the batch sketch in SQL —
    streaming quantile monitoring whose answer is EXACTLY reproducible
    offline. See streaming/pipeline.sample_sketch_stream."""
    import tempfile
    import uuid

    from pydala2_spark.functions.sketch import discrete_quantiles
    from pydala2_spark.streaming.pipeline import (
        read_event_stream,
        run_to_memory,
        sample_sketch_rows,
        sample_sketch_stream,
    )

    events = read_event_stream(spark, f"{sf_dir}/events.parquet")
    sk = sample_sketch_stream(events, "event_type", "event_id", "value", k=128)
    name = f"kmvq_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix=f"ck_{name}_")
    drained = run_to_memory(sk, name, ck, state_partitions=4)
    rows = sample_sketch_rows(drained, "event_type")
    return discrete_quantiles(
        rows,
        "event_type",
        "__val",
        "__key",
        {"p50_est": 0.5, "p90_est": 0.9, "p99_est": 0.99},
        n_alias="sample_n",
    )



@query(
    "stream_static_enrich",
    f"""
    SELECT event_type,
           CAST(length(event_type) AS INT) AS weight,
           count(*) AS n_events,
           {_osum("value * length(event_type)")} AS weighted_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ninth streaming oracle query: STREAM-STATIC enrichment — the
    arriving stream joins a static dimension (broadcast, re-resolved
    per micro-batch) before the rollup, the standard "enrich the
    firehose with reference data" topology. The weight dimension
    derives from the event type so the oracle can reconstruct it in
    SQL; production swaps in any keyed reference table with the same
    plan. Decimal-accumulated weighted sums make the drained result
    equal the batch answer bit-for-bit.

    100 TB/day shape: the dim broadcasts (no stream-side shuffle for
    the join); state is one partial per (type) — bounded by the key
    space forever."""
    import tempfile
    import uuid

    from pydala2_spark.streaming.pipeline import read_event_stream, run_to_memory

    dim = (
        _t(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .withColumn("weight", F.length("event_type").cast("int"))
    )
    events = read_event_stream(spark, f"{sf_dir}/events.parquet")
    enriched = events.join(F.broadcast(dim), "event_type").groupBy(
        "event_type", "weight"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum((F.col("value") * F.col("weight")).cast(_DEC)), 2
        )
        .cast("double")
        .alias("weighted_value"),
    )
    name = f"enrich_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix=f"ck_{name}_")
    return run_to_memory(
        enriched, name, ck, state_partitions=4, output_mode="complete"
    )



@query(
    "stream_stream_join",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS lag_us,
           round(p.value, 2) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Twelfth streaming oracle query: STREAM-STREAM interval join —
    two branches of the event firehose (clicks, purchases) correlated
    within a 30-minute window, the attribution topology neither
    stream-static enrichment nor the as-of BATCH join covers. The
    watermark + interval condition bound each side's join state to
    rate x window (never history); inner-join matches emit
    immediately, so the availableNow drain equals the batch interval
    join bit-for-bit (integer µs lags, one rounded value).
    See streaming/pipeline.interval_join_streams."""
    import tempfile
    import uuid

    from pydala2_spark.streaming.pipeline import (
        interval_join_streams,
        read_event_stream,
        run_to_memory,
    )

    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    clicks = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
    )
    joined = interval_join_streams(
        clicks,
        purchases,
        key="user_id",
        left_ts="c_ts",
        right_ts="p_ts",
        upper="30 minutes",
        watermark="2 hours",
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_us"),
        F.round("value", 2).alias("purchase_value"),
    )
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix=f"ck_{name}_")
    return run_to_memory(
        joined, name, ck, state_partitions=4, output_mode="append"
    )



@query(
    "stream_cusum_alarm",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), p AS (
      SELECT event_type,
             CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS mu
      FROM d GROUP BY 1
    ), pp AS (
      SELECT event_type, mu,
             greatest(CAST(1 AS BIGINT), CAST(floor(mu / 10) AS BIGINT)) AS k,
             mu AS h
      FROM p
    ), s AS (
      SELECT d.event_type, d.day, pp.h,
             CAST(sum(d.x - pp.mu - pp.k) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS ps
      FROM d JOIN pp USING (event_type)
    ), g AS (
      SELECT event_type, day, h,
             ps - least(CAST(0 AS BIGINT),
                        CAST(min(ps) OVER (
                          PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT)) AS gv,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nd
      FROM s
    )
    SELECT event_type,
           CAST(max(nd) AS BIGINT) AS n_days,
           CAST(max(CASE WHEN rn = nd THEN gv END) AS BIGINT) AS g_final,
           CAST(max(gv) AS BIGINT) AS max_g,
           CAST(sum(CASE WHEN gv > h THEN 1 ELSE 0 END) AS BIGINT) AS n_above
    FROM g GROUP BY event_type
    """,
)
def stream_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tenth streaming oracle query: CUSUM drift monitoring of daily
    event VOLUMES per type as custom bounded state — the "is traffic
    structurally above its reference rate" alarm, maintained with
    FIVE INTEGERS per group forever via the reset-free identity
    g_t = S_t - min(0, min S_j). Reference parameters (mu/k/h,
    integer floor arithmetic) come from a batch pre-pass and
    broadcast into the stream — the production topology (fit on
    history, monitor the live stream). Integer-exact, so the drained
    state equals the oracle's window-SQL computation to the digit.
    See streaming/pipeline.cusum_volume_stream."""
    import tempfile
    import uuid

    from pydala2_spark.streaming.pipeline import (
        cusum_volume_stream,
        read_event_stream,
        run_to_memory,
    )

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    mu = F.floor(
        F.sum("x").cast("double") / F.count(F.lit(1))
    ).cast("long")
    params = (
        daily.groupBy("event_type")
        .agg(mu.alias("mu"))
        .select(
            "event_type",
            "mu",
            F.greatest(
                F.lit(1).cast("long"),
                F.floor(F.col("mu") / 10).cast("long"),
            ).alias("k"),
            F.col("mu").alias("h"),
        )
    )
    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    cs = cusum_volume_stream(stream, params)
    name = f"cusum_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix=f"ck_{name}_")
    drained = run_to_memory(cs, name, ck, state_partitions=4)
    last = drained.groupBy("event_type").agg(
        F.max_by(
            F.struct("n_days", "g_final", "max_g", "n_above"), "n_seen"
        ).alias("__s")
    )
    return last.select(
        "event_type",
        F.col("__s.n_days").alias("n_days"),
        F.col("__s.g_final").alias("g_final"),
        F.col("__s.max_g").alias("max_g"),
        F.col("__s.n_above").alias("n_above"),
    )



@query(
    "stream_topk_ingest",
    """
    SELECT event_type, rank, event_id, value
    FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id ASC) AS rank
      FROM events
      WHERE event_id IS NOT NULL AND value IS NOT NULL
    ) WHERE rank <= 5
    """,
)
def stream_topk_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eleventh streaming oracle query: a live LEADERBOARD — the k=5
    highest-value events per type maintained as O(k) bounded state.
    A top-k is a pure function of the row set (like the sample
    sketch), so the drained board equals the batch answer bit-for-bit
    under any micro-batch split or arrival order; output values are
    bit-copies of inputs (selection, no arithmetic).
    See streaming/pipeline.topk_stream."""
    import tempfile
    import uuid

    from pydala2_spark.streaming.pipeline import (
        read_event_stream,
        run_to_memory,
        topk_stream,
    )

    events = read_event_stream(spark, f"{sf_dir}/events.parquet")
    tk = topk_stream(events, "event_type", "event_id", "value", k=5)
    name = f"topk_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix=f"ck_{name}_")
    drained = run_to_memory(tk, name, ck, state_partitions=4)
    last = drained.groupBy("event_type").agg(
        F.max_by(F.struct("ids", "vals"), "n_seen").alias("__s")
    )
    flat = last.select(
        "event_type",
        F.posexplode("__s.ids").alias("__p", "event_id"),
        F.col("__s.vals").alias("__vals"),
    )
    return flat.select(
        "event_type",
        (F.col("__p") + 1).cast("int").alias("rank"),
        "event_id",
        F.element_at("__vals", F.col("__p") + 1).alias("value"),
    )



_UPSERT_SINK_ORACLE = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 2)
             AS value_sum,
           round(min(value), 2) AS min_value
    FROM events
    GROUP BY 1
    """



@query("stream_upsert_sink", _UPSERT_SINK_ORACLE)
def stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thirteenth streaming oracle query: CDC-style streaming UPSERT
    sink — the landing zone drains through foreachBatch into a managed
    dataset via the keyed merge, with per-batch markers making replays
    effectively-once (streaming/pipeline.merge_stream). The target is
    PRE-SEEDED with corrupted rows (value = -9999 for every tenth
    event), so the oracle comparison against the pristine table proves
    the upsert actually OVERWROTE matched keys rather than appending:
    a surviving seed row drags min_value and value_sum off the oracle.
    At 100 TB the per-batch cost is proportional to the files whose
    key ranges the batch touches, not the dataset size."""
    import shutil

    from pydala2_spark.streaming.pipeline import merge_stream

    root = _app_scoped_tmp(spark, sf_dir, "pydala2_spark_upsq")
    run = f"{root}/run"
    shutil.rmtree(run, ignore_errors=True)
    target, ckpt = f"{run}/target", f"{run}/ckpt"
    ev = _t(spark, sf_dir, "events")
    seed = ev.filter(F.col("event_id") % 10 == 0).withColumn(
        "value", F.lit(-9999.0)
    )
    seed.write.parquet(target)
    merge_stream(
        spark,
        f"{sf_dir}/events.parquet",
        target,
        key_columns=["event_id"],
        checkpoint_dir=ckpt,
    )
    back = spark.read.parquet(target)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 2
        ).alias("value_sum"),
        F.round(F.min("value"), 2).alias("min_value"),
    )


@query(
    "stream_session_funnel",
    """
    WITH gaps AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id, event_type,
             CAST(epoch_us(ts) AS HUGEINT) * 1000000000 + event_id AS k,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS session_id
      FROM gaps
    ), s1 AS (
      SELECT user_id, session_id,
             min(CASE WHEN event_type = 'view' THEN k END) AS k1
      FROM sess GROUP BY 1, 2
    ), s2 AS (
      SELECT sess.user_id, sess.session_id,
             min(CASE WHEN event_type = 'click' AND k > k1 THEN k END) AS k2
      FROM sess JOIN s1 USING (user_id, session_id)
      GROUP BY 1, 2
    ), s3 AS (
      SELECT sess.user_id, sess.session_id,
             min(CASE WHEN event_type = 'purchase' AND k > k2 THEN k END)
               AS k3
      FROM sess JOIN s2 USING (user_id, session_id)
      GROUP BY 1, 2
    ), st AS (
      SELECT CASE WHEN k3 IS NOT NULL THEN 3
                  WHEN k2 IS NOT NULL THEN 2
                  WHEN k1 IS NOT NULL THEN 1
                  ELSE 0 END AS stage_reached
      FROM s1
      JOIN s2 USING (user_id, session_id)
      JOIN s3 USING (user_id, session_id)
    )
    SELECT stage_reached, CAST(count(*) AS BIGINT) AS n_sessions
    FROM st GROUP BY 1
    """,
)
def stream_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ORACLE ORDER-KEY BOUND: the oracle encodes the in-session event
    # order as k = epoch_us(ts) * 1e9 + event_id (HUGEINT), which
    # matches the operator's lexicographic (ts, event_id) sort only
    # while event_id < 1e9 — testdata event_ids are dense row numbers
    # far below that; a corpus with larger ids would need the oracle
    # to compare (ts, event_id) tuples directly.
    # custom STATEFUL streaming operator, oracle-checked end-to-end:
    # per-user session-scoped ORDERED funnel (first view, first click
    # after it, first purchase after that; sessions split on >30 min
    # gaps) via applyInPandasWithState, drained with availableNow.
    # Every session lands in exactly one deepest-stage bucket; the
    # incremental state machine must converge to the three-pass batch
    # SQL on a finite input. Open sessions at end-of-input count at
    # their current stage in BOTH forms (the batch form has no
    # session-closing timeout either).
    import os
    import tempfile
    import uuid

    from pydala2_spark.streaming.pipeline import (
        funnel_sessions_stream,
        read_event_stream,
        run_to_memory,
    )

    events = read_event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    fun = funnel_sessions_stream(events)
    name = f"funnel_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix=f"ck_{name}_")
    drained = run_to_memory(fun, name, ck, state_partitions=4)
    stages = drained.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("stage_reached"),
                        F.col(f"s{i}").alias("cnt"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("r")
    ).select("r.*")
    return (
        stages.groupBy("stage_reached")
        .agg(F.sum("cnt").cast("long").alias("n_sessions"))
        .filter(F.col("n_sessions") > 0)
    )


@query(
    "stream_freshness",
    """
    WITH per AS (
      SELECT event_type, max(ts) AS last_ts,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type
    ), f AS (SELECT max(last_ts) AS mx FROM per)
    SELECT event_type, n_events,
           strftime(last_ts, '%Y-%m-%d %H:%M:%S') AS last_seen,
           round(CAST(epoch_us(f.mx) - epoch_us(last_ts) AS DOUBLE)
                 / 3600000000.0, 4) AS lag_hours
    FROM per, f
    """,
)
def stream_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the ALWAYS-ON twin of dq_freshness: a complete-mode streaming
    # aggregation holds one (frontier, count) tuple per event_type and
    # updates it per micro-batch; drained with availableNow it must
    # converge to the batch scan's answer. State never expires (no
    # watermark — a freshness monitor that forgets its frontier would
    # re-alert on every quiet period).
    import os
    import tempfile
    import uuid

    from pydala2_spark.streaming.pipeline import (
        freshness_stream,
        read_event_stream,
        run_to_memory,
    )

    events = read_event_stream(spark, os.path.join(sf_dir, "events.parquet"))
    fresh = freshness_stream(events)
    name = f"fresh_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix=f"ck_{name}_")
    drained = run_to_memory(
        fresh, name, ck, state_partitions=4, output_mode="complete"
    )
    frontier = drained.agg(F.max("last_ts").alias("__mx"))
    return drained.crossJoin(F.broadcast(frontier)).select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
        F.round(
            (F.unix_micros("__mx") - F.unix_micros("last_ts")).cast("double")
            / F.lit(3.6e9),
            4,
        ).alias("lag_hours"),
    )
