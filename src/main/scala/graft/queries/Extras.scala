package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import QB._

/** Remaining SURVEY §2 surface: PIVOT, map functions, interval arithmetic,
  * binary functions, controlled filter (error routing), NOW()-style
  * temporal evaluation.
  */
object Extras {

  val queries: Seq[Q] = Seq(
    // PIVOT (SURVEY §2.8 misc) — Spark native pivot; oracle is the
    // equivalent FILTER-ed aggregate spread.
    Q(
      "agg_pivot",
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
    },

    // MAP construction/access (sqllib/src/map.rs; map.md). Raw map columns
    // are avoided in the output (engine-specific parquet encoding); we
    // emit sorted keys, summed values, and a point lookup.
    Q(
      "fn_map",
      """SELECT o_orderkey,
        |  array_to_string(list_sort(map_keys(m)), ',') AS ks,
        |  (m['p'])[1] AS pv,
        |  len(map_keys(m)) AS n_keys,
        |  list_reduce(map_values(m), (a, b) -> a + b) AS v_sum
        |FROM (
        |  SELECT o_orderkey,
        |    map(['p', 's', 'k2'],
        |        [CAST(FLOOR(o_totalprice) AS BIGINT), CAST(LENGTH(o_orderstatus) AS BIGINT), o_orderkey * 2]) AS m
        |  FROM orders WHERE o_orderkey <= 1000)""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") <= 1000)
        .select(col("o_orderkey"),
          map_from_arrays(
            array(lit("p"), lit("s"), lit("k2")),
            array(floor(col("o_totalprice")).cast("long"),
              length(col("o_orderstatus")).cast("long"),
              col("o_orderkey") * 2)).as("m"))
        .select(col("o_orderkey"),
          array_join(sort_array(map_keys(col("m"))), ",").as("ks"),
          element_at(col("m"), "p").as("pv"),
          size(map_keys(col("m"))).cast("long").as("n_keys"),
          aggregate(map_values(col("m")), lit(0L), (a, b) => a + b)
            .as("v_sum"))
    },

    // Interval arithmetic (sqllib/src/interval.rs; datetime.md operators):
    // month-clamped adds, TIMESTAMPDIFF/TIMESTAMPADD.
    Q(
      "fn_interval",
      """SELECT o_orderkey,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  CAST(o_orderdate - INTERVAL 45 DAY AS DATE) AS minus45d,
        |  CAST(o_orderdate + INTERVAL 1 YEAR AS DATE) AS plus1y,
        |  DATE_DIFF('month', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS months_since,
        |  DATE_DIFF('hour', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS hours_since
        |FROM orders WHERE o_orderkey <= 20000""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") <= 20000)
        .select(col("o_orderkey"),
          add_months(col("o_orderdate"), 3).as("plus3m"),
          date_sub(col("o_orderdate").cast("date"), 45).as("minus45d"),
          add_months(col("o_orderdate"), 12).as("plus1y"),
          expr("timestampdiff(MONTH, DATE '1995-01-01', CAST(o_orderdate AS DATE))")
            .as("months_since"),
          expr("timestampdiff(HOUR, TIMESTAMP '1995-01-01 00:00:00', o_orderdate)")
            .as("hours_since"))
    },

    // Binary functions (sqllib/src/binary.rs; binary.md). Restricted to
    // the blob surface DuckDB 1.0 shares: hex / concat / octet_length /
    // base64 / utf8 round-trip.
    Q(
      "fn_binary",
      """SELECT p_partkey,
        |  octet_length(b) AS blen,
        |  hex(b) AS bhex,
        |  hex(b || encode('!')) AS bconcat,
        |  base64(b) AS b64,
        |  decode(b) AS roundtrip
        |FROM (SELECT p_partkey, encode(p_name) AS b FROM part WHERE p_partkey <= 500)""".stripMargin) {
      (s, dir) =>
        t(s, dir, "part").filter(col("p_partkey") <= 500)
          .select(col("p_partkey"),
            col("p_name").cast("binary").as("b"))
          .select(col("p_partkey"),
            octet_length(col("b")).cast("long").as("blen"),
            hex(col("b")).as("bhex"),
            hex(concat(col("b"), lit("!").cast("binary"))).as("bconcat"),
            base64(col("b")).as("b64"),
            col("b").cast("string").as("roundtrip"))
    },

    // Controlled filter / error routing (controlled_filter.rs): rows
    // violating a validity rule land in the error view with a reason.
    Q(
      "controlled_filter_errors",
      """SELECT l_orderkey, l_linenumber, l_discount,
        |  'discount out of range' AS error_reason
        |FROM lineitem WHERE NOT (l_discount <= 0.08)""".stripMargin) {
      (s, dir) =>
        val (_, errors) = graft.ops.ControlledFilter.route(
          t(s, dir, "lineitem"),
          col("l_discount") <= 0.08, "discount out of range")
        errors.select("l_orderkey", "l_linenumber", "l_discount",
          "error_reason")
    },

    // LAG/LEAD/FIRST_VALUE with IGNORE NULLS (RankAggregate /
    // LeadLagAggregates surface).
    Q(
      "win_ignore_nulls",
      """SELECT o_orderkey,
        |  lag(big_price IGNORE NULLS) OVER w AS prev_big,
        |  first_value(big_price IGNORE NULLS) OVER w AS first_big,
        |  last_value(big_price IGNORE NULLS) OVER w AS last_big
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    CASE WHEN o_totalprice > 200000 THEN o_totalprice END AS big_price
        |  FROM orders WHERE o_orderkey <= 30000)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
        t(s, dir, "orders").filter(col("o_orderkey") <= 30000)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            when(col("o_totalprice") > 200000, col("o_totalprice"))
              .as("big_price"))
          .select(col("o_orderkey"),
            lag(col("big_price"), 1, null, ignoreNulls = true).over(w)
              .as("prev_big"),
            first(col("big_price"), ignoreNulls = true).over(w)
              .as("first_big"),
            last(col("big_price"), ignoreNulls = true).over(w)
              .as("last_big"))
    },

    // Exact interpolated quantiles (sample.rs / stream_key_quantiles
    // analogue — here the exact batch form; integer-valued doubles keep
    // the interpolation arithmetic identical across engines).
    Q(
      "agg_quantiles",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        |  MAX(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
          max(col("l_quantity")).as("max_qty"))
    },

    // DECIMAL edge semantics (SURVEY §7.4 hard parts; crates/fxp/):
    // exact fixed-point add/sub/mul, HALF_UP rounding incl. negatives,
    // scale-preserving string rendering. Results pinned as VARCHAR so the
    // hash-match checks DIGITS, not float proximity. (DECIMAL division is
    // engine-specific — DuckDB returns DOUBLE — so quotients go through
    // double on both sides.)
    Q(
      "fn_decimal",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(p + p AS VARCHAR) AS dsum,
        |  CAST(p - q AS VARCHAR) AS ddiff,
        |  CAST(p * q AS VARCHAR) AS dprod,
        |  CAST(ROUND(p * q, 1) AS VARCHAR) AS dround,
        |  CAST(ROUND(0 - (p * q), 1) AS VARCHAR) AS dround_neg,
        |  CAST(CAST(p AS DOUBLE) / CAST(q AS DOUBLE) AS DOUBLE) AS dquot
        |FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) AS p,
        |    CAST(l_quantity + 0.5 AS DECIMAL(8,2)) AS q
        |  FROM lineitem WHERE l_orderkey <= 6000)""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").filter(col("l_orderkey") <= 6000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").cast(DecimalType(12, 2)).as("p"),
          (col("l_quantity") + 0.5).cast(DecimalType(8, 2)).as("q"))
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("p") + col("p")).cast("string").as("dsum"),
          (col("p") - col("q")).cast("string").as("ddiff"),
          (col("p") * col("q")).cast("string").as("dprod"),
          round(col("p") * col("q"), 1).cast("string").as("dround"),
          round(lit(0) - col("p") * col("q"), 1).cast("string")
            .as("dround_neg"),
          (col("p").cast("double") / col("q").cast("double")).as("dquot"))
    },

    // PARSE_DATE / PARSE_TIMESTAMP / FORMAT_DATE (timestamp.rs parse/format
    // surface): each engine uses its own pattern dialect to express the
    // same conversion, results compared as epoch/date.
    Q(
      "fn_parse",
      """SELECT o_orderkey,
        |  CAST(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS DATE) AS reparsed,
        |  CAST(FLOOR(EPOCH(strptime(strftime(o_orderdate, '%Y/%m/%d'), '%Y/%m/%d'))) AS BIGINT) AS day_epoch,
        |  strftime(o_orderdate, '%d-%m-%Y') AS dmy
        |FROM orders WHERE o_orderkey <= 10000""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") <= 10000)
        .select(col("o_orderkey"),
          to_timestamp(date_format(col("o_orderdate"),
            "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss").cast("date")
            .as("reparsed"),
          unix_timestamp(to_timestamp(date_format(col("o_orderdate"),
            "yyyy/MM/dd"), "yyyy/MM/dd")).as("day_epoch"),
          date_format(col("o_orderdate"), "dd-MM-yyyy").as("dmy"))
    },

    // MAP_AGG (sqllib/src/map.rs map_agg): engine map encodings differ in
    // parquet, so the map round-trips through sorted entries for compare.
    Q(
      "agg_map_agg",
      """SELECT n_regionkey,
        |  array_to_string(list_sort(map_keys(map_from_entries(list((n_name, CAST(n_nationkey AS BIGINT)))))), ',') AS ks,
        |  list_reduce(map_values(map_from_entries(list((n_name, CAST(n_nationkey AS BIGINT))))), (a, b) -> a + b) AS vsum
        |FROM nation GROUP BY n_regionkey""".stripMargin) { (s, dir) =>
      t(s, dir, "nation").groupBy("n_regionkey")
        .agg(map_from_entries(collect_list(
          struct(col("n_name"), col("n_nationkey").cast("long")))).as("m"))
        .select(col("n_regionkey"),
          array_join(sort_array(map_keys(col("m"))), ",").as("ks"),
          aggregate(map_values(col("m")), lit(0L), (a, b) => a + b)
            .as("vsum"))
    },

    // NOW()-driven temporal filter (ImplementNow.java, DBSPNowOperator,
    // now.md: NOW() is the circuit STEP time). The step clock is PINNED
    // via Pipeline.advanceClock, so the oracle replays the filter with
    // the same literal — and the graded run exercises the clock-advance
    // re-evaluation: rows ingested live under the first clock, then a
    // later clock RETRACTS the expired week. Final content = what
    // survives the second clock.
    Q(
      "ts_now",
      """SELECT event_id, user_id, event_type FROM events
        |WHERE ts >= TIMESTAMP '2024-02-01 00:00:00' - INTERVAL 10 DAY"""
        .stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,
          | user_id BIGINT, event_type VARCHAR);
          |CREATE VIEW live AS
          |  SELECT event_id, user_id, event_type FROM events
          |  WHERE ts >= NOW() - INTERVAL 10 DAY;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      // pin the clock BEFORE data arrives, ingest, then advance: the
      // second clock expires 2024-01-15..21 rows, emitting retractions
      pipe.advanceClock(java.sql.Timestamp.valueOf("2024-01-25 00:00:00"))
      pipe.step(Map("events" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "events")
          .select("event_id", "ts", "user_id", "event_type"))))
      pipe.advanceClock(java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
      pipe.adHoc("SELECT * FROM live")
    },

    // UNPIVOT (grammar.md:482-497) through the VIEW SQL path: the
    // reference's Calcite spelling (INCLUDING NULLS) is dialect-mapped to
    // Spark's native UNPIVOT ... INCLUDE NULLS (Dialect.normalize). One
    // measure over three key columns, one of them nullable, aggregated so
    // INCLUDING vs EXCLUDING semantics are observable (n counts null-val
    // rows; nv does not). Oracle spells the unpivot as the equivalent
    // UNION ALL — engine-shared by construction.
    Q(
      "agg_unpivot",
      """SELECT metric, CAST(SUM(val) AS BIGINT) AS total,
        |  COUNT(*) AS n, COUNT(val) AS nv
        |FROM (
        |  SELECT 'k1' AS metric, o_custkey AS val FROM orders
        |  UNION ALL
        |  SELECT 'k2' AS metric, o_orderkey % 97 AS val FROM orders
        |  UNION ALL
        |  SELECT 'k3' AS metric, NULLIF(o_orderkey % 5, 0) AS val
        |  FROM orders)
        |GROUP BY metric""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE ord (o_orderkey BIGINT, k1 BIGINT, k2 BIGINT,
          | k3 BIGINT);
          |CREATE VIEW u AS
          |  SELECT metric, CAST(SUM(val) AS BIGINT) AS total,
          |    COUNT(*) AS n, COUNT(val) AS nv
          |  FROM ord
          |  UNPIVOT INCLUDING NULLS (val FOR metric IN (k1, k2, k3))
          |  GROUP BY metric;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("ord" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "orders").select(col("o_orderkey"),
          col("o_custkey").as("k1"),
          (col("o_orderkey") % 97).as("k2"),
          nullif(col("o_orderkey") % 5, lit(0)).as("k3")))))
      pipe.adHoc("SELECT * FROM u")
    },

    // The reference's SQL-spelled ASOF join (grammar.md "ASOF joins":
    // LEFT ASOF JOIN … MATCH_CONDITION (l.ts >= r.ts) ON …) through the
    // VIEW SQL path — Dialect lowers it to the union+window form
    // (ops.AsofJoin's shape: one exchange on the key + one sort,
    // O(n log n)); the oracle uses DuckDB's native ASOF LEFT JOIN,
    // cross-checking the lowering on the FULL events table (the r11
    // lateral lowering needed an event_id bound to hide its quadratic
    // decorrelation; the union+window form does not).
    Q(
      "join_asof_sql",
      """SELECT e.event_id, e.user_id, p.purchase_val
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'error') e
        |ASOF LEFT JOIN (
        |  SELECT user_id AS p_user, ts AS p_ts,
        |    CAST(MAX(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |      AS purchase_val
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts) p
        |ON e.user_id = p.p_user AND e.ts >= p.p_ts""".stripMargin) {
      (s, dir) =>
      val prog =
        """CREATE TABLE ev (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
          | event_type VARCHAR, value DOUBLE);
          |CREATE VIEW a AS
          |  SELECT e.event_id, e.user_id, p.purchase_val
          |  FROM (SELECT event_id, user_id, ts FROM ev
          |        WHERE event_type = 'error') e
          |  LEFT ASOF JOIN (
          |    SELECT user_id AS p_user, ts AS p_ts,
          |      CAST(MAX(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
          |        AS purchase_val
          |    FROM ev WHERE event_type = 'purchase'
          |    GROUP BY user_id, ts) p
          |  MATCH_CONDITION (e.ts >= p.p_ts)
          |  ON e.user_id = p.p_user;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("ev" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "events")
          .select("event_id", "ts", "user_id", "event_type", "value"))))
      pipe.adHoc("SELECT * FROM a")
    },

    // DISTINCT ON (grammar.md:367-372, PostgreSQL-style first-row-per-
    // group) through the VIEW SQL path: Dialect lowers it to a rank-1
    // filter (ON exprs partition, statement ORDER BY as the window
    // order). DuckDB supports DISTINCT ON natively — the oracle uses it
    // verbatim, cross-checking the lowering; the ORDER BY carries a
    // unique tiebreaker so the first row is deterministic.
    Q(
      "distinct_on",
      """SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey
        |FROM customer
        |ORDER BY c_nationkey, c_acctbal DESC, c_custkey""".stripMargin) {
      (s, dir) =>
      val prog =
        """CREATE TABLE cust (c_custkey BIGINT, c_nationkey INT,
          | c_acctbal DOUBLE);
          |CREATE VIEW top_per_nation AS
          |  SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey
          |  FROM cust
          |  ORDER BY c_nationkey, c_acctbal DESC, c_custkey;"""
          .stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("cust" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "customer")
          .select("c_custkey", "c_nationkey", "c_acctbal"))))
      pipe.adHoc("SELECT * FROM top_per_nation")
    },

    // MINUS (grammar.md:337 — synonym of EXCEPT): native in Spark;
    // pinned through the pipeline view path. DuckDB has no MINUS, so
    // the oracle spells the EXCEPT synonym.
    Q(
      "setop_minus",
      """SELECT c_nationkey FROM customer
        |EXCEPT
        |SELECT n_nationkey FROM nation WHERE n_nationkey < 10""".stripMargin) {
      (s, dir) =>
      val prog =
        """CREATE TABLE cust (c_nationkey INT);
          |CREATE TABLE nat (n_nationkey INT);
          |CREATE VIEW m AS
          |  SELECT c_nationkey FROM cust
          |  MINUS
          |  SELECT n_nationkey FROM nat WHERE n_nationkey < 10;"""
          .stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map(
        "cust" -> graft.zset.ZSets.lift(
          tRaw(s, dir, "customer").select("c_nationkey")),
        "nat" -> graft.zset.ZSets.lift(tRaw(s, dir, "nation")
          .select(col("n_nationkey").cast("int")))))
      pipe.adHoc("SELECT * FROM m")
    },

    // SQL hints + SET options (grammar.md "SQL hints" :514-573,
    // "Setting options" :774-797) through the pipeline: the program
    // carries SET statements (accepted, recorded) and a broadcast +
    // shard query hint that Dialect maps to Spark's BROADCAST /
    // SHUFFLE_HASH strategy hints. Hints never change results — the
    // oracle is the plain join.
    Q(
      "join_hint_broadcast",
      """SELECT n_name, COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      val prog =
        """SET FELDERA_WARNINGS_ARE_ERRORS = ON;
          |SET FELDERA_IGNORE_WARNING_UNUSED_COLUMN = ON;
          |CREATE TABLE cust (c_custkey BIGINT, c_nationkey INT,
          | c_acctbal DOUBLE);
          |CREATE TABLE nat (n_nationkey INT, n_name VARCHAR);
          |CREATE VIEW hinted AS
          |  SELECT /*+ broadcast(nat), shard(cust) */ n_name,
          |    COUNT(*) AS n,
          |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
          |      AS bal
          |  FROM cust JOIN nat ON c_nationkey = n_nationkey
          |  GROUP BY n_name;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map(
        "cust" -> graft.zset.ZSets.lift(tRaw(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey").cast("int"),
            col("c_acctbal"))),
        "nat" -> graft.zset.ZSets.lift(tRaw(s, dir, "nation")
          .select(col("n_nationkey").cast("int"), col("n_name")))))
      pipe.adHoc("SELECT * FROM hinted")
    },

    // Skew-aware salted join (SURVEY §2.3 #44, ops/SkewJoin): the probe
    // side salts each row into `factor` buckets and the build side
    // replicates, splitting a hot key across factor tasks; the RESULT is
    // identical to the plain equi-join, which is exactly what the oracle
    // checks (plain join + aggregate).
    Q(
      "join_skew",
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
        |  COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_quantity"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderpriority"))
      graft.ops.SkewJoin.salted(li, o, Seq("k"), factor = 8)
        .groupBy("o_orderpriority")
        .agg(sum(col("l_quantity").cast(DecimalType(18, 4)))
          .cast("double").as("qty"),
          count(lit(1)).as("n"))
    },

    // SINGLE_VALUE guard (SURVEY §2.4 #56, aggregate.rs single-value
    // semantics): exactly-one-row groups pass the value through; a
    // multi-row group raises. Graded over 1-row-per-key groups (the
    // oracle's MIN is equal there by construction); the error path is
    // FunctionsSpec's.
    Q(
      "agg_single_value",
      """SELECT n_nationkey, MIN(n_regionkey) AS rk FROM nation
        |GROUP BY n_nationkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val agg = org.apache.spark.sql.functions.udaf(
        graft.functions.WeightedAggs.singleValueLong)
      t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey").cast("long"))
        .groupBy("n_nationkey")
        .agg(agg(col("n_regionkey")).as("rk"))
    },

    // QUALIFY (grammar.md:721 — filter on window aggregates) through the
    // VIEW SQL path: Spark has no QUALIFY clause, so Dialect lowers it to
    // a filtered subquery (window-alias references inlined). DuckDB
    // supports QUALIFY natively — the oracle uses it verbatim, so the
    // lowering's semantics are cross-checked engine-to-engine.
    Q(
      "win_qualify",
      """SELECT c_nationkey, c_custkey FROM customer
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey) = 1""".stripMargin) {
      (s, dir) =>
      val prog =
        """CREATE TABLE cust (c_custkey BIGINT, c_nationkey INT,
          | c_acctbal DOUBLE);
          |CREATE VIEW top_bal AS
          |  SELECT c_nationkey, c_custkey FROM cust
          |  QUALIFY ROW_NUMBER() OVER (PARTITION BY c_nationkey
          |    ORDER BY c_acctbal DESC, c_custkey) = 1;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("cust" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "customer")
          .select("c_custkey", "c_nationkey", "c_acctbal"))))
      pipe.adHoc("SELECT * FROM top_bal")
    },

    // QUALIFY inside a SUBQUERY (the grammar attaches one per SELECT
    // block): Dialect recurses into the enclosing paren group, so the
    // nested block lowers exactly like a top-level one; the outer block
    // aggregates the per-nation winners. DuckDB's native nested QUALIFY
    // is the oracle.
    Q(
      "win_qualify_nested",
      """SELECT w.c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(w.c_custkey) AS BIGINT) AS ksum
        |FROM (
        |  SELECT c_mktsegment, c_custkey FROM customer
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal DESC, c_custkey) <= 3) w
        |GROUP BY w.c_mktsegment""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE cust (c_custkey BIGINT, c_nationkey INT,
          | c_acctbal DOUBLE, c_mktsegment VARCHAR);
          |CREATE VIEW seg_top AS
          |  SELECT w.c_mktsegment, COUNT(*) AS n,
          |    CAST(SUM(w.c_custkey) AS BIGINT) AS ksum
          |  FROM (
          |    SELECT c_mktsegment, c_custkey FROM cust
          |    QUALIFY ROW_NUMBER() OVER (PARTITION BY c_nationkey
          |      ORDER BY c_acctbal DESC, c_custkey) <= 3) w
          |  GROUP BY w.c_mktsegment;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("cust" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "customer")
          .select("c_custkey", "c_nationkey", "c_acctbal",
            "c_mktsegment"))))
      pipe.adHoc("SELECT * FROM seg_top")
    },

    // ANSI OFFSET … FETCH (grammar.md:343) through the VIEW SQL path:
    // Dialect maps it to Spark's LIMIT/OFFSET (clause order swapped).
    // The ORDER BY key is unique, so the page is deterministic.
    Q(
      "sort_fetch",
      """SELECT o_orderkey, o_custkey FROM orders
        |ORDER BY o_orderkey OFFSET 10 LIMIT 7""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE ord (o_orderkey BIGINT, o_custkey BIGINT);
          |CREATE VIEW page AS
          |  SELECT o_orderkey, o_custkey FROM ord
          |  ORDER BY o_orderkey OFFSET 10 ROWS FETCH NEXT 7 ROWS ONLY;"""
          .stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("ord" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "orders").select("o_orderkey", "o_custkey"))))
      pipe.adHoc("SELECT * FROM page")
    },

    // GROUP BY ALL / ORDER BY ALL (grammar.md:374,417): native in both
    // Spark and DuckDB — the graded row pins the shared spelling through
    // the pipeline view path.
    Q(
      "agg_group_by_all",
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE ord (o_orderkey BIGINT, o_orderpriority VARCHAR,
          | o_orderstatus VARCHAR);
          |CREATE VIEW byall AS
          |  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
          |  FROM ord GROUP BY ALL ORDER BY ALL;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("ord" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "orders")
          .select("o_orderkey", "o_orderpriority", "o_orderstatus"))))
      pipe.adHoc("SELECT * FROM byall")
    },

    // CROSS APPLY (grammar.md tableExpression) through the VIEW SQL
    // path: maps to Spark's CROSS JOIN LATERAL (Dialect.normalize); the
    // applied correlated aggregate always yields one row, so the oracle
    // is the scalar-subquery equivalent.
    Q(
      "join_cross_apply",
      """SELECT r_regionkey AS rk,
        |  (SELECT COUNT(*) FROM nation
        |   WHERE n_regionkey = r_regionkey) AS cnt,
        |  (SELECT MAX(n_name) FROM nation
        |   WHERE n_regionkey = r_regionkey) AS mx
        |FROM region""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE reg (r_regionkey BIGINT, r_name VARCHAR);
          |CREATE TABLE nat (n_nationkey BIGINT, n_name VARCHAR,
          | n_regionkey BIGINT);
          |CREATE VIEW agg AS
          |  SELECT r.r_regionkey AS rk, s.cnt, s.mx FROM reg r
          |  CROSS APPLY (
          |    SELECT COUNT(*) AS cnt, MAX(n.n_name) AS mx
          |    FROM nat n WHERE n.n_regionkey = r.r_regionkey) s;"""
          .stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map(
        "reg" -> graft.zset.ZSets.lift(
          tRaw(s, dir, "region").select("r_regionkey", "r_name")),
        "nat" -> graft.zset.ZSets.lift(tRaw(s, dir, "nation")
          .select("n_nationkey", "n_name", "n_regionkey"))))
      pipe.adHoc("SELECT * FROM agg")
    },

    // OUTER APPLY through the VIEW SQL path: maps to LEFT OUTER JOIN
    // LATERAL ... ON TRUE — rows with an empty applied subquery are
    // null-extended, which the LEFT JOIN oracle mirrors exactly.
    Q(
      "join_outer_apply",
      """SELECT n.n_nationkey, c.c_custkey FROM nation n
        |LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
        |  AND c.c_acctbal > 9000""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE nat (n_nationkey BIGINT, n_name VARCHAR);
          |CREATE TABLE cust (c_custkey BIGINT, c_nationkey INT,
          | c_acctbal DOUBLE);
          |CREATE VIEW oa AS
          |  SELECT n.n_nationkey, s.c_custkey FROM nat n
          |  OUTER APPLY (
          |    SELECT c.c_custkey FROM cust c
          |    WHERE c.c_nationkey = n.n_nationkey
          |      AND c.c_acctbal > 9000) s;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map(
        "nat" -> graft.zset.ZSets.lift(
          tRaw(s, dir, "nation").select("n_nationkey", "n_name")),
        "cust" -> graft.zset.ZSets.lift(tRaw(s, dir, "customer")
          .select("c_custkey", "c_nationkey", "c_acctbal"))))
      pipe.adHoc("SELECT * FROM oa")
    },

    // SELECT * REPLACE (expr AS col) (grammar.md:407-408) through the
    // VIEW SQL path: Spark has no REPLACE star modifier, so the pipeline
    // expands the star to the explicit column list with the replaced
    // positions swapped IN PLACE (Pipeline.rewriteReplaceStar). DuckDB
    // supports * REPLACE natively — the oracle uses it directly, so the
    // order-preserving contract is cross-checked engine-to-engine.
    Q(
      "map_replace",
      """SELECT * REPLACE (n_name || '!' AS n_name,
        |                  n_nationkey * 100 AS n_nationkey)
        |FROM nation""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE nat (n_nationkey BIGINT, n_name VARCHAR,
          | n_regionkey BIGINT);
          |CREATE VIEW named AS
          |  SELECT * REPLACE (n_name || '!' AS n_name,
          |                    n_nationkey * 100 AS n_nationkey)
          |  FROM nat;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("nat" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "nation")
          .select("n_nationkey", "n_name", "n_regionkey"))))
      pipe.adHoc("SELECT * FROM named")
    },

    // ROW(...) constructor (grammar.md:430-436) through the VIEW SQL
    // path: ROW(T.*) maps to Spark's struct (Dialect.normalize), fields
    // re-projected as scalars for the hashable output; the oracle
    // computes the same fields directly (DuckDB's unnamed-ROW field
    // naming differs, so the struct itself never surfaces).
    Q(
      "fn_row",
      """SELECT r_regionkey AS k, upper(r_name) AS nm FROM region""".stripMargin) {
      (s, dir) =>
      val prog =
        """CREATE TABLE reg (r_regionkey BIGINT, r_name VARCHAR);
          |CREATE VIEW packed AS
          |  SELECT ROW(reg.*) AS r FROM reg;
          |CREATE VIEW flat AS
          |  SELECT r.r_regionkey AS k, upper(r.r_name) AS nm FROM packed;"""
          .stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("reg" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "region").select("r_regionkey", "r_name"))))
      pipe.adHoc("SELECT * FROM flat")
    },

    // SELECT * EXCLUDE(cols) (grammar.md:403-444) through the VIEW SQL
    // path: the reference's EXCLUDE spelling (synonym of EXCEPT after *)
    // is dialect-mapped to Spark's SELECT * EXCEPT (Dialect.normalize),
    // which prunes the excluded columns at the scan. Oracle names the
    // surviving columns explicitly.
    Q(
      "map_exclude",
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE c_custkey <= 500""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE cust (c_custkey BIGINT, c_name VARCHAR,
          | c_nationkey INT, c_acctbal DOUBLE, c_mktsegment VARCHAR);
          |CREATE VIEW slim AS
          |  SELECT * EXCLUDE (c_acctbal, c_mktsegment) FROM cust
          |  WHERE c_custkey <= 500;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("cust" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "customer").select("c_custkey", "c_name",
          "c_nationkey", "c_acctbal", "c_mktsegment"))))
      pipe.adHoc("SELECT * FROM slim")
    },

    // Double-quoted + U&"..." Unicode-escaped identifiers
    // (identifiers.md): standard-SQL quoted identifiers (case- and
    // space-preserving) flow through Dialect's backtick spelling map —
    // declared in the table DDL, re-quoted in one view, referenced via
    // the U& code-point variant in the next.
    Q(
      "map_quoted_idents",
      """SELECT c_custkey AS k, c_nationkey AS nk FROM customer
        |WHERE c_custkey <= 300""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE cust ("Cust Key" BIGINT, c_nationkey INT);
          |CREATE VIEW mixed AS
          |  SELECT "Cust Key" AS "Cust #", c_nationkey FROM cust
          |  WHERE "Cust Key" <= 300;
          |CREATE VIEW flat AS
          |  SELECT U&"Cust\0020#" AS k, c_nationkey AS nk FROM mixed;"""
          .stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("cust" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "customer")
          .select(col("c_custkey").as("Cust Key"), col("c_nationkey")))))
      pipe.adHoc("SELECT * FROM flat")
    },

    // The chrono/strftime surface under its reference spellings
    // (datetime.md:460-560 FORMAT_DATE/FORMAT_TIMESTAMP/PARSE_DATE/
    // PARSE_TIMESTAMP — %-directive patterns): registered SQL wrappers
    // over the Strftime translator, exercised through the VIEW path.
    // DuckDB's strftime/strptime speak the same %-dialect (args
    // reversed), so the oracle cross-checks directive-for-directive.
    Q(
      "fn_strftime",
      """SELECT o_orderkey AS k,
        |  strftime(o_orderdate, '%Y/%m/%d %H:%M:%S') AS ymdhms,
        |  strftime(o_orderdate, '%j|%a|%b') AS jab,
        |  strftime(CAST(o_orderdate AS DATE), '%Y.%m') AS ym,
        |  CAST(strptime('2021-07-15', '%Y-%m-%d') AS DATE) AS pd,
        |  epoch_ms(strptime('2021-07-15 10:20:30',
        |                    '%Y-%m-%d %H:%M:%S')) AS pts
        |FROM orders WHERE o_orderkey <= 5000""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE ord (o_orderkey BIGINT, o_orderdate TIMESTAMP);
          |CREATE VIEW f AS
          |  SELECT o_orderkey AS k,
          |    FORMAT_TIMESTAMP('%Y/%m/%d %H:%M:%S', o_orderdate)
          |      AS ymdhms,
          |    FORMAT_TIMESTAMP('%j|%a|%b', o_orderdate) AS jab,
          |    FORMAT_DATE('%Y.%m', CAST(o_orderdate AS DATE)) AS ym,
          |    PARSE_DATE('%Y-%m-%d', '2021-07-15') AS pd,
          |    unix_millis(PARSE_TIMESTAMP('%Y-%m-%d %H:%M:%S',
          |      '2021-07-15 10:20:30')) AS pts
          |  FROM ord WHERE o_orderkey <= 5000;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("ord" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "orders").select("o_orderkey", "o_orderdate"))))
      pipe.adHoc("SELECT * FROM f")
    },

    // SQL:2011 period predicates (datetime.md:370-379): the infix
    // `(start, end) OVERLAPS|EQUALS|[IMMEDIATELY] PRECEDES|SUCCEEDS|
    // CONTAINS …` forms, lowered by Dialect.rewritePeriodPredicates to
    // plain comparisons (Spark has no surface for them); the oracle
    // spells the documented comparison semantics directly.
    Q(
      "fn_period",
      """SELECT k,
        |  (s1 <= e2 AND e1 >= s2) AS ov,
        |  (s1 = s2 AND e1 = e2) AS eqp,
        |  (e1 <= s2) AS pr, (e1 = s2) AS ipr,
        |  (s1 >= e2) AS sc, (s1 = e2) AS isc,
        |  (s1 <= s2 AND e1 >= e2) AS cnp,
        |  (s1 <= v AND v <= e1) AS cnv
        |FROM (
        |  SELECT o_orderkey AS k, o_orderdate AS s1,
        |    o_orderdate + INTERVAL 5 DAY AS e1,
        |    o_orderdate + INTERVAL 1 DAY * (o_orderkey % 11 - 5) AS s2,
        |    o_orderdate + INTERVAL 1 DAY * (o_orderkey % 11 - 2) AS e2,
        |    o_orderdate + INTERVAL 2 DAY AS v
        |  FROM orders WHERE o_orderkey <= 4000)""".stripMargin) {
      (s, dir) =>
      val prog =
        """CREATE TABLE ord (o_orderkey BIGINT, o_orderdate TIMESTAMP);
          |CREATE VIEW p AS
          |  SELECT k,
          |    (s1, e1) OVERLAPS (s2, e2) AS ov,
          |    (s1, e1) EQUALS (s2, e2) AS eqp,
          |    (s1, e1) PRECEDES (s2, e2) AS pr,
          |    (s1, e1) IMMEDIATELY PRECEDES (s2, e2) AS ipr,
          |    (s1, e1) SUCCEEDS (s2, e2) AS sc,
          |    (s1, e1) IMMEDIATELY SUCCEEDS (s2, e2) AS isc,
          |    (s1, e1) CONTAINS (s2, e2) AS cnp,
          |    (s1, e1) CONTAINS v AS cnv
          |  FROM (
          |    SELECT o_orderkey AS k, o_orderdate AS s1,
          |      o_orderdate + INTERVAL '5' DAY AS e1,
          |      o_orderdate + INTERVAL '1' DAY * (o_orderkey % 11 - 5)
          |        AS s2,
          |      o_orderdate + INTERVAL '1' DAY * (o_orderkey % 11 - 2)
          |        AS e2,
          |      o_orderdate + INTERVAL '2' DAY AS v
          |    FROM ord WHERE o_orderkey <= 4000) periods;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("ord" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "orders").select("o_orderkey", "o_orderdate"))))
      pipe.adHoc("SELECT * FROM p")
    },

    // LOGICAL_AND / LOGICAL_OR (aggregates.md:90 — BOOL_AND/BOOL_OR
    // synonyms, Dialect-mapped) + GROUPING_ID (grammar.md:650, native)
    // under a ROLLUP; TO_INT (binary.md:118 — big-endian bytes → INT).
    Q(
      "agg_logical_id",
      """SELECT g, bool_and(f) AS la, bool_or(f) AS lo,
        |  CAST(GROUPING(g) AS BIGINT) AS gid, COUNT(*) AS n
        |FROM (SELECT o_orderpriority AS g, o_totalprice > 100000 AS f
        |      FROM orders) GROUP BY ROLLUP(g)""".stripMargin) {
      (s, dir) =>
      val prog =
        """CREATE TABLE ord (o_orderpriority VARCHAR, o_totalprice DOUBLE);
          |CREATE VIEW a AS
          |  SELECT g, LOGICAL_AND(f) AS la, LOGICAL_OR(f) AS lo,
          |    CAST(GROUPING_ID(g) AS BIGINT) AS gid, COUNT(*) AS n
          |  FROM (SELECT o_orderpriority AS g, o_totalprice > 100000 AS f
          |        FROM ord) flags GROUP BY ROLLUP(g);""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("ord" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "orders")
          .select("o_orderpriority", "o_totalprice"))))
      pipe.adHoc("SELECT * FROM a")
    },

    // SAFE_CAST (casts.md:77 — NULL instead of a runtime error; Spark
    // spells it TRY_CAST), the `::` cast operator (casts.md), and the
    // reference's UNLIMITED bare VARCHAR (types.md — Spark demands a
    // length, so Dialect maps the bare spelling to STRING) through the
    // VIEW path.
    Q(
      "cast_safe",
      """SELECT o_orderkey AS k,
        |  TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS p_num,
        |  TRY_CAST(o_orderpriority AS INT) AS bad,
        |  CAST(o_orderkey AS VARCHAR) AS k_str,
        |  o_orderkey :: VARCHAR AS k_cc
        |FROM orders WHERE o_orderkey <= 3000""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE ord (o_orderkey BIGINT, o_orderpriority VARCHAR);
          |CREATE VIEW c AS
          |  SELECT o_orderkey AS k,
          |    SAFE_CAST(substring(o_orderpriority, 1, 1) AS INT)
          |      AS p_num,
          |    SAFE_CAST(o_orderpriority AS INT) AS bad,
          |    CAST(o_orderkey AS VARCHAR) AS k_str,
          |    o_orderkey :: VARCHAR AS k_cc
          |  FROM ord WHERE o_orderkey <= 3000;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("ord" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "orders")
          .select("o_orderkey", "o_orderpriority"))))
      pipe.adHoc("SELECT * FROM c")
    },

    // TO_INT(binary) (binary.md:118: big-endian unsigned bytes → INT;
    // TO_INT(x'0abc') => 2748) — the oracle re-derives from the same
    // characters' code points.
    Q(
      "fn_to_int",
      """SELECT c_custkey AS k,
        |  65536 * ord(substr(c_name, 10, 1))
        |    + 256 * ord(substr(c_name, 11, 1))
        |    + ord(substr(c_name, 12, 1)) AS ti
        |FROM customer WHERE c_custkey <= 200""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE cust (c_custkey BIGINT, c_name VARCHAR);
          |CREATE VIEW b AS
          |  SELECT c_custkey AS k,
          |    CAST(TO_INT(CAST(substring(c_name, 10, 3) AS BINARY))
          |         AS INT) AS ti
          |  FROM cust WHERE c_custkey <= 200;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("cust" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "customer").select("c_custkey", "c_name"))))
      pipe.adHoc("SELECT * FROM b")
    },

    // NATURAL JOIN (grammar.md tableExpression) — native in both
    // engines: the shared column (nationkey) joins and deduplicates.
    Q(
      "join_natural",
      """SELECT nationkey, n_name, COUNT(*) AS n_cust
        |FROM (SELECT c_custkey, c_nationkey AS nationkey FROM customer) c
        |NATURAL JOIN
        |  (SELECT n_nationkey AS nationkey, n_name FROM nation) n
        |GROUP BY nationkey, n_name""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE cust (c_custkey BIGINT, c_nationkey INT);
          |CREATE TABLE nat (n_nationkey INT, n_name VARCHAR);
          |CREATE VIEW j AS
          |  SELECT nationkey, n_name, COUNT(*) AS n_cust
          |  FROM (SELECT c_custkey, c_nationkey AS nationkey FROM cust) c
          |  NATURAL JOIN
          |    (SELECT n_nationkey AS nationkey, n_name FROM nat) n
          |  GROUP BY nationkey, n_name;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map(
        "cust" -> graft.zset.ZSets.lift(
          tRaw(s, dir, "customer").select("c_custkey", "c_nationkey")),
        "nat" -> graft.zset.ZSets.lift(tRaw(s, dir, "nation")
          .select(col("n_nationkey").cast("int"), col("n_name")))))
      pipe.adHoc("SELECT * FROM j")
    },

    // JOIN … USING (grammar.md joinCondition) — native in both engines;
    // LEFT form so the null-extension of unmatched keys is pinned, and
    // the USING column is emitted once (coalesced).
    Q(
      "join_using",
      """SELECT nationkey, COUNT(r_name) AS named, COUNT(*) AS n
        |FROM (SELECT c_nationkey AS nationkey FROM customer) c
        |LEFT JOIN (SELECT r_regionkey AS nationkey, r_name FROM region) r
        |USING (nationkey)
        |GROUP BY nationkey""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE cust (c_nationkey INT);
          |CREATE TABLE reg (r_regionkey INT, r_name VARCHAR);
          |CREATE VIEW j AS
          |  SELECT nationkey, COUNT(r_name) AS named, COUNT(*) AS n
          |  FROM (SELECT c_nationkey AS nationkey FROM cust) c
          |  LEFT JOIN (SELECT r_regionkey AS nationkey, r_name
          |             FROM (TABLE reg)) r
          |  USING (nationkey)
          |  GROUP BY nationkey;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map(
        "cust" -> graft.zset.ZSets.lift(
          tRaw(s, dir, "customer").select(col("c_nationkey").cast("int"))),
        "reg" -> graft.zset.ZSets.lift(tRaw(s, dir, "region")
          .select(col("r_regionkey").cast("int"), col("r_name")))))
      pipe.adHoc("SELECT * FROM j")
    },

    // SQL-spelled PIVOT as a tableReference suffix (grammar.md:466-481)
    // — native in Spark; the oracle spreads with FILTER.
    Q(
      "agg_pivot_sql",
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE ord (o_orderpriority VARCHAR, o_orderstatus VARCHAR);
          |CREATE VIEW piv AS
          |  SELECT * FROM ord
          |  PIVOT (COUNT(*) FOR o_orderstatus
          |         IN ('F' AS f, 'O' AS o, 'P' AS p));""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("ord" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "orders")
          .select("o_orderpriority", "o_orderstatus"))))
      pipe.adHoc("SELECT * FROM piv")
    },

    // ORDER BY ALL [DESC] (grammar.md:417) — native in Spark 4 and
    // DuckDB; made observable with a LIMIT (the driver compare is
    // order-insensitive, so only the survivor set pins the ordering).
    Q(
      "sort_order_by_all",
      """SELECT n_regionkey, n_name FROM nation
        |ORDER BY ALL DESC LIMIT 5""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE nat (n_regionkey INT, n_name VARCHAR);
          |CREATE VIEW top5 AS
          |  SELECT n_regionkey, n_name FROM nat
          |  ORDER BY ALL DESC LIMIT 5;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("nat" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "nation").select("n_regionkey", "n_name"))))
      pipe.adHoc("SELECT * FROM top5")
    },

    // Lateral column aliasing (grammar.md "SELECT supports lateral
    // column aliasing"; identifiers.md) — an alias defined in a SELECT
    // list is referenced by the next item. Native in Spark 3.4+; the
    // oracle spells the expansion out (engine-independent).
    Q(
      "map_lateral_alias",
      """SELECT c_custkey, c_nationkey * 100 AS scaled,
        |  c_nationkey * 100 + c_custkey % 100 AS mixed
        |FROM customer WHERE c_custkey <= 500""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE cust (c_custkey BIGINT, c_nationkey INT);
          |CREATE VIEW lat AS
          |  SELECT c_custkey, c_nationkey * 100 AS scaled,
          |    scaled + c_custkey % 100 AS mixed
          |  FROM cust WHERE c_custkey <= 500;""".stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("cust" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "customer").select("c_custkey", "c_nationkey"))))
      pipe.adHoc("SELECT * FROM lat")
    },

    // ROW(T.* EXCLUDE (cols)) (grammar.md rowStarItem) — the star-with-
    // exclusion form inside the ROW constructor; packed then flattened
    // (fn_row's discipline: the driver compare needs scalar columns).
    Q(
      "fn_row_exclude",
      """SELECT c_custkey AS k, upper(c_name) AS nm FROM customer
        |WHERE c_custkey <= 500""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE cust (c_custkey BIGINT, c_name VARCHAR,
          | c_acctbal DOUBLE, c_mktsegment VARCHAR);
          |CREATE VIEW packed AS
          |  SELECT ROW(cust.* EXCLUDE (c_acctbal, c_mktsegment)) AS r
          |  FROM cust WHERE c_custkey <= 500;
          |CREATE VIEW flat AS
          |  SELECT r.c_custkey AS k, upper(r.c_name) AS nm FROM packed;"""
          .stripMargin
      val pipe = graft.runtime.Pipeline(s, prog)
      pipe.step(Map("cust" -> graft.zset.ZSets.lift(
        tRaw(s, dir, "customer").select("c_custkey", "c_name",
          "c_acctbal", "c_mktsegment"))))
      pipe.adHoc("SELECT * FROM flat")
    }
  )
}
