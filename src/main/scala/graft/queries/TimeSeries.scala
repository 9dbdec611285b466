package graft.queries

import org.apache.spark.sql.functions._
import QB._

/** Time-series / windowing operators in their batch form (SURVEY §2.7).
  * Reference: compileTumble CalciteToDBSPCompiler.java:543,
  * DBSPHopOperator.java:24 (ExpandHop), SessionRewriteRule.java,
  * DBSPPartitionedRollingAggregateOperator.java:30.
  * The streaming equivalents (watermarked `window()`/`session_window()`)
  * live in graft.streaming; these batch queries pin down the window
  * *semantics* against the DuckDB oracle using integer epoch math, which is
  * deterministic in both engines.
  */
object TimeSeries {

  val queries: Seq[Q] = Seq(
    // TUMBLE: 1-hour fixed windows — just a floored projection, exactly as
    // the reference compiles it (a pure map, no state).
    Q(
      "ts_tumble",
      """SELECT (CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 3600) * 3600 AS wstart,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
        |FROM events
        |GROUP BY (CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 3600) * 3600, event_type""".stripMargin) {
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("wstart",
            expr("unix_timestamp(ts) div 3600") * 3600)
          .groupBy("wstart", "event_type")
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_val"))
    },

    // HOP: 1-hour windows sliding by 15 min → each event lands in 4
    // windows (reference expands HOP to a flatmap — ExpandHop.java; Spark's
    // window(slide) does the same row expansion).
    Q(
      "ts_hop",
      """SELECT wstart, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
        |FROM (
        |  SELECT unnest(range((CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 900) - 3, (CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 900) + 1)) * 900 AS wstart,
        |    value
        |  FROM events)
        |GROUP BY wstart""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .withColumn("slot", expr("unix_timestamp(ts) div 900"))
        .withColumn("wstart",
          explode(sequence(col("slot") - 3, col("slot"))))
        .withColumn("wstart", col("wstart") * 900)
        .groupBy("wstart")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_val"))
    },

    // SESSION windows: 30-minute gap per user → session stats.
    Q(
      "ts_session",
      """WITH base AS (
        |  SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS es FROM events),
        |marked AS (
        |  SELECT user_id, event_id, es,
        |    CASE WHEN LAG(es) OVER w IS NULL OR es - LAG(es) OVER w > 1800
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM base
        |  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
        |sessions AS (
        |  SELECT user_id, es,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY es, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM marked)
        |SELECT user_id, session_seq, COUNT(*) AS n_events,
        |  MIN(es) AS session_start, MAX(es) AS session_end
        |FROM sessions GROUP BY user_id, session_seq""".stripMargin) {
      (s, dir) =>
        graft.ops.Sessionize
          .assign(
            t(s, dir, "events")
              .withColumn("es", unix_timestamp(col("ts"))),
            "user_id", "es", 1800, "event_id")
          .groupBy("user_id", "session_seq")
          .agg(count(lit(1)).as("n_events"),
            min(col("es")).as("session_start"),
            max(col("es")).as("session_end"))
    },

    // Rolling aggregate over a numeric RANGE frame (1-hour trailing window
    // per user) — the reference's PartitionedRollingAggregate. RANGE frames
    // include ts-peers regardless of order → deterministic.
    Q(
      "ts_rolling",
      """SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h,
        |  MAX(value) OVER w AS max_1h
        |FROM (SELECT event_id, user_id, value, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS es FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY es RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("es")
          .rangeBetween(-3600, Window.currentRow)
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"),
            unix_timestamp(col("ts")).as("es"))
          .select(col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("n_1h"),
            sum(dec(col("value"))).over(w).cast("double").as("sum_1h"),
            max(col("value")).over(w).as("max_1h"))
    },

    // Temporal filter (reference: DBSPWindowOperator.java:27 — monotone
    // moving window). Batch form: fixed bounds relative to the table max
    // (NOW() is nondeterministic across engines; the streaming NOW path is
    // exercised in graft.streaming specs).
    Q(
      "ts_temporal_filter",
      """SELECT event_id, user_id, event_type
        |FROM events
        |WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 1 DAY""".stripMargin) {
      (s, dir) =>
        val ev = t(s, dir, "events")
        ev.join(broadcast(ev.agg(max(col("ts")).as("max_ts"))),
            col("ts") >= col("max_ts") - expr("INTERVAL 1 DAY"))
          .select("event_id", "user_id", "event_type")
    },

    // The SQL-spelled TUMBLE table function (table.md:24-66;
    // SqlWindowTableFunction surface) through the VIEW path: Dialect
    // lowers TABLE(TUMBLE(TABLE t, DESCRIPTOR(c), size)) to a projection
    // over Spark's native window() — a narrow map on the scan, no
    // shuffle before the aggregate. The oracle re-derives window bounds
    // with integer epoch math.
    Q(
      "ts_tumble_sql",
      """SELECT (CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 3600) * 3600000 AS ws,
        |  ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 3600) + 1) * 3600000 AS we,
        |  event_type, COUNT(*) AS n
        |FROM events GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP,
          | event_type VARCHAR);
          |CREATE VIEW w AS
          |  SELECT window_start, window_end, event_type, COUNT(*) AS n
          |  FROM TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts),
          |                    INTERVAL '1' HOUR))
          |  GROUP BY window_start, window_end, event_type;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("ev" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "events").select("event_id", "ts", "event_type"))))
      pipe.adHoc("SELECT unix_millis(window_start) AS ws, " +
        "unix_millis(window_end) AS we, event_type, n FROM w")
    },

    // The SQL-spelled HOP table function (table.md:72-119) in its
    // named-parameter form (data =>, timecol =>, slide =>, size =>):
    // Dialect swaps (slide, size) into Spark's window(size, slide),
    // which fans each row to its covering windows — the reference's
    // ExpandHop flatmap, here one codegen'd generator on the scan.
    Q(
      "ts_hop_sql",
      """SELECT ((CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 1800) - u.i) * 1800000 AS ws,
        |  COUNT(*) AS n
        |FROM events, (VALUES (0), (1)) u(i)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP);
          |CREATE VIEW w AS
          |  SELECT window_start, COUNT(*) AS n
          |  FROM TABLE(HOP(
          |    data => TABLE ev,
          |    timecol => DESCRIPTOR(ts),
          |    slide => INTERVAL '30' MINUTE,
          |    size => INTERVAL '1' HOUR))
          |  GROUP BY window_start;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("ev" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "events").select("event_id", "ts"))))
      pipe.adHoc("SELECT unix_millis(window_start) AS ws, n FROM w")
    },

    // The SQL-spelled SESSION table function (table.md:122-183) with a
    // key descriptor: Dialect emits the reference's own rewrite
    // (SessionRewriteRule.java:51 — brk = ts >= prev + gap, RANGE-frame
    // running sum as the session id, min/max + gap as the bounds): one
    // exchange on the key + one sort, O(n log n) at any scale. The
    // oracle spells the identical islands construction in DuckDB.
    Q(
      "ts_session_sql",
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |           OR ts >= LAG(ts) OVER w + INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
        |  FROM marked)
        |SELECT user_id, epoch_ms(MIN(ts)) AS ws,
        |  epoch_ms(MAX(ts) + INTERVAL 30 MINUTE) AS we, COUNT(*) AS n
        |FROM sess GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP,
          | user_id BIGINT);
          |CREATE VIEW w AS
          |  SELECT user_id, window_start, window_end, COUNT(*) AS n
          |  FROM TABLE(SESSION(TABLE ev, DESCRIPTOR(ts),
          |                     DESCRIPTOR(user_id), INTERVAL '30' MINUTE))
          |  GROUP BY user_id, window_start, window_end;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("ev" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "events").select("event_id", "ts", "user_id"))))
      pipe.adHoc("SELECT user_id, unix_millis(window_start) AS ws, " +
        "unix_millis(window_end) AS we, n FROM w")
    }
  )
}
