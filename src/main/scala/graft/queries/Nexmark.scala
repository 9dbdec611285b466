package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.zset.ZSets

/** The reference's Nexmark SQL suite as CORRECTNESS rows.
  *
  * The repo benches Nexmark analogues (StreamBench) but never graded
  * them; here the reference's OWN query texts
  * (benchmark/feldera-sql/benchmarks/nexmark/queries/q*.sql, verbatim
  * up to connector clauses and a quoted-alias spelling) run as standing
  * views of one Pipeline over deterministically generated events —
  * fed in three delta steps with a retraction wave, so the graded
  * final state exercises the IVM path — and the DuckDB oracle
  * RECOMPUTES each query from scratch over the same generator
  * arithmetic (`range()` + pure integer formulas), so the comparison
  * is engine-vs-engine, not self-vs-self.
  *
  * Determinism: bid price is injective in the event id
  * ((i·7919) mod 100000007 — gcd(7919, p)=1), so every ROW_NUMBER
  * ordering in q9/q18/q19 is a total order and the TopK row sets are
  * unique; timestamps are strictly increasing in i. Integral AVG
  * follows Calcite (integer division) on both sides — the engine via
  * the moments rewrite, DuckDB via explicit `SUM // COUNT`.
  */
object Nexmark {

  private val NBID = 20000L
  private val NAUC = 500L
  private val NPER = 200L
  private val BASE = 1700000000000L

  /** Generator CTEs, dialect-parameterized: the SAME arithmetic text
    * runs in Spark (timestamp_millis over range(n)) and DuckDB
    * (epoch_ms over range(n) t(i)).
    */
  private def genCtes(duck: Boolean): String = {
    // Spark side must land on TIMESTAMP_NTZ (the declared table type;
    // timestamp_millis yields the tz flavor)
    def tsOpen = if (duck) "epoch_ms(" else "CAST(timestamp_millis("
    def tsClose = if (duck) ")" else ") AS TIMESTAMP_NTZ)"
    def src(n: Long) =
      if (duck) s"(SELECT range AS i FROM range($n))"
      else s"(SELECT id AS i FROM range($n))"
    s"""person AS (
       |  SELECT i AS id, 'person_' || i AS name,
       |    'e' || i || '@x.com' AS emailAddress, 'cc' || i AS creditCard,
       |    'city_' || (i % 50) AS city,
       |    CASE i % 5 WHEN 0 THEN 'OR' WHEN 1 THEN 'ID' WHEN 2 THEN 'CA'
       |      WHEN 3 THEN 'WA' ELSE 'NV' END AS state,
       |    $tsOpen$BASE + (i % 50) * 1000$tsClose AS date_time,
       |    'px' || (i % 7) AS extra
       |  FROM ${src(NPER)} p0),
       |auction AS (
       |  SELECT i AS id, 'item_' || (i % 37) AS itemName,
       |    'd' || i AS description, (i % 1000) + 1 AS initialBid,
       |    (i % 500) + 50 AS reserve,
       |    $tsOpen$BASE + (i % 80) * 1000$tsClose AS date_time,
       |    $tsOpen$BASE + (i % 80) * 1000 + ((i % 120) + 1) * 500$tsClose AS expires,
       |    i % $NPER AS seller, i % 25 AS category,
       |    'ax' || (i % 11) AS extra
       |  FROM ${src(NAUC)} a0),
       |bid AS (
       |  SELECT i % $NAUC AS auction, i % $NPER AS bidder,
       |    (i * 7919) % 100000007 + 100 AS price,
       |    CASE WHEN i % 10 = 0 THEN
       |      CASE i % 4 WHEN 0 THEN 'Apple' WHEN 1 THEN 'Google'
       |        WHEN 2 THEN 'Facebook' ELSE 'Baidu' END
       |    ELSE 'channel-' || (i % 997) END AS channel,
       |    'https://b.example.com/page' || (i % 50) || '/item' ||
       |      (i % 13) || '.htm?query=1' ||
       |      CASE WHEN i % 3 = 0 THEN '&channel_id=' || (i % 997)
       |        ELSE '' END AS url,
       |    $tsOpen$BASE + i * 125$tsClose AS date_time,
       |    'extra_' || (i % 97) ||
       |      repeat('c', CAST(i % 5 AS INT)) AS extra
       |  FROM ${src(NBID)} b0)""".stripMargin
  }

  /** The Pipeline program: reference table schemas (connector clauses
    * dropped) + the reference query texts. Minimal spelling
    * adaptations: `as 'day'` → `as "day"`, and q14/q22's helper
    * functions inlined as CREATE FUNCTION bodies the engine supports.
    */
  private val program: String =
    """CREATE TABLE person (
      |  id BIGINT, name VARCHAR, emailAddress VARCHAR,
      |  creditCard VARCHAR, city VARCHAR, state VARCHAR,
      |  date_time TIMESTAMP(3) NOT NULL, extra VARCHAR);
      |CREATE TABLE auction (
      |  id BIGINT, itemName VARCHAR, description VARCHAR,
      |  initialBid BIGINT, reserve BIGINT,
      |  date_time TIMESTAMP(3) NOT NULL, expires TIMESTAMP(3),
      |  seller BIGINT, category BIGINT, extra VARCHAR);
      |CREATE TABLE bid (
      |  auction BIGINT, bidder BIGINT, price BIGINT, channel VARCHAR,
      |  url VARCHAR, date_time TIMESTAMP(3) NOT NULL, extra VARCHAR);
      |CREATE FUNCTION COUNT_CHAR(S VARCHAR, C VARCHAR) RETURNS INT
      |AS LENGTH(S) - LENGTH(REPLACE(S, C, ''));
      |CREATE FUNCTION SPLIT_INDEX(s VARCHAR, sep VARCHAR, idx INT)
      |RETURNS VARCHAR AS SPLIT(s, CAST(sep AS VARCHAR))[idx + 1];
      |CREATE VIEW q0 AS
      |SELECT auction, bidder, price, date_time, extra FROM bid;
      |CREATE VIEW q1 AS
      |SELECT auction, bidder, 0.908 * price as price, date_time, extra
      |FROM bid;
      |CREATE VIEW q2 AS
      |SELECT auction, price FROM bid WHERE MOD(auction, 123) = 0;
      |CREATE VIEW q3 AS SELECT P.name, P.city, P.state, A.id
      |FROM auction AS A INNER JOIN person AS P on A.seller = P.id
      |WHERE A.category = 10
      |  and (P.state = 'OR' OR P.state = 'ID' OR P.state = 'CA');
      |CREATE VIEW q4 AS
      |SELECT Q.category, AVG(Q.final) AS av
      |FROM (
      |    SELECT MAX(B.price) AS final, A.category
      |    FROM auction A, bid B
      |    WHERE A.id = B.auction
      |      AND B.date_time BETWEEN A.date_time AND A.expires
      |    GROUP BY A.id, A.category
      |) Q
      |GROUP BY Q.category;
      |CREATE VIEW q5 AS
      |SELECT AuctionBids.auction, AuctionBids.num
      | FROM (
      |   SELECT B1.auction, count(*) AS num,
      |     window_start AS starttime, window_end AS endtime
      |   FROM TABLE(HOP(TABLE bid, DESCRIPTOR(date_time),
      |     INTERVAL 2 SECOND, INTERVAL 10 SECOND)) AS B1
      |   GROUP BY B1.auction, window_start, window_end
      | ) AS AuctionBids
      | JOIN (
      |   SELECT max(CountBids.num) AS maxn,
      |     CountBids.starttime, CountBids.endtime
      |   FROM (
      |     SELECT count(*) AS num, window_start AS starttime,
      |       window_end AS endtime
      |     FROM TABLE(HOP(TABLE bid, DESCRIPTOR(date_time),
      |       INTERVAL 2 SECOND, INTERVAL 10 SECOND)) AS B2
      |     GROUP BY B2.auction, window_start, window_end
      |     ) AS CountBids
      |   GROUP BY CountBids.starttime, CountBids.endtime
      | ) AS MaxBids
      | ON AuctionBids.starttime = MaxBids.starttime AND
      |    AuctionBids.endtime = MaxBids.endtime AND
      |    AuctionBids.num >= MaxBids.maxn;
      |CREATE VIEW q7 AS
      |SELECT B.auction, B.price, B.bidder, B.date_time, B.extra
      |from bid B
      |JOIN (
      |  SELECT MAX(B1.price) AS maxprice,
      |    TUMBLE_START(B1.date_time, INTERVAL '10' SECOND) as date_time
      |  FROM bid B1
      |  GROUP BY TUMBLE(B1.date_time, INTERVAL '10' SECOND)
      |) B1
      |ON B.price = B1.maxprice
      |WHERE B.date_time BETWEEN B1.date_time - INTERVAL '10' SECOND
      |  AND B1.date_time;
      |CREATE VIEW q8 AS
      |SELECT P.id, P.name, P.starttime
      |FROM (
      |  SELECT P.id, P.name,
      |    TUMBLE_START(P.date_time, INTERVAL '10' SECOND) AS starttime,
      |    TUMBLE_END(P.date_time, INTERVAL '10' SECOND) AS endtime
      |  FROM person P
      |  GROUP BY P.id, P.name, TUMBLE(P.date_time, INTERVAL '10' SECOND)
      |) P
      |JOIN (
      |  SELECT A.seller,
      |    TUMBLE_START(A.date_time, INTERVAL '10' SECOND) AS starttime,
      |    TUMBLE_END(A.date_time, INTERVAL '10' SECOND) AS endtime
      |  FROM auction A
      |  GROUP BY A.seller, TUMBLE(A.date_time, INTERVAL '10' SECOND)
      |) A
      |ON P.id = A.seller AND P.starttime = A.starttime
      |  AND P.endtime = A.endtime;
      |CREATE VIEW q9 AS
      |SELECT
      |  id, itemName, description, initialBid, reserve, date_time,
      |  expires, seller, category, extra,
      |  auction, bidder, price, bid_dateTime, bid_extra
      |FROM (
      |   SELECT A.*, B.auction, B.bidder, B.price,
      |     B.date_time AS bid_dateTime, B.extra AS bid_extra,
      |     ROW_NUMBER() OVER (PARTITION BY A.id
      |       ORDER BY B.price DESC, B.date_time ASC) AS rownum
      |   FROM auction A, bid B
      |   WHERE A.id = B.auction
      |     AND B.date_time BETWEEN A.date_time AND A.expires
      |)
      |WHERE rownum <= 1;
      |CREATE VIEW q14 AS
      |SELECT auction, bidder, 0.908 * price as price,
      |  CASE
      |    WHEN HOUR(date_time) >= 8 AND HOUR(date_time) <= 18
      |      THEN 'dayTime'
      |    WHEN HOUR(date_time) <= 6 OR HOUR(date_time) >= 20
      |      THEN 'nightTime'
      |    ELSE 'otherTime'
      |  END AS bidTimeType,
      |  date_time, extra, count_char(extra, 'c') AS c_counts
      |FROM bid
      |WHERE 0.908 * price > 1000000 AND 0.908 * price < 50000000;
      |CREATE VIEW q15 AS
      |SELECT CAST(date_time AS DATE) as "day",
      |  count(*) AS total_bids,
      |  count(*) filter (where price < 10000) AS rank1_bids,
      |  count(*) filter (where price >= 10000 and price < 1000000)
      |    AS rank2_bids,
      |  count(*) filter (where price >= 1000000) AS rank3_bids,
      |  count(distinct bidder) AS total_bidders,
      |  count(distinct bidder) filter (where price < 10000)
      |    AS rank1_bidders,
      |  count(distinct bidder) filter (where price >= 10000 and
      |    price < 1000000) AS rank2_bidders,
      |  count(distinct bidder) filter (where price >= 1000000)
      |    AS rank3_bidders,
      |  count(distinct auction) AS total_auctions,
      |  count(distinct auction) filter (where price < 10000)
      |    AS rank1_auctions,
      |  count(distinct auction) filter (where price >= 10000 and
      |    price < 1000000) AS rank2_auctions,
      |  count(distinct auction) filter (where price >= 1000000)
      |    AS rank3_auctions
      |FROM bid
      |GROUP BY CAST(date_time AS DATE);
      |CREATE VIEW q16 AS
      |SELECT channel, CAST(date_time AS DATE) as "day",
      |  format_date('HH:mm', max(date_time)) as "minute",
      |  count(*) AS total_bids,
      |  count(*) filter (where price < 10000) AS rank1_bids,
      |  count(*) filter (where price >= 10000 and price < 1000000)
      |    AS rank2_bids,
      |  count(*) filter (where price >= 1000000) AS rank3_bids,
      |  count(distinct bidder) AS total_bidders,
      |  count(distinct bidder) filter (where price < 10000)
      |    AS rank1_bidders,
      |  count(distinct bidder) filter (where price >= 10000 and
      |    price < 1000000) AS rank2_bidders,
      |  count(distinct bidder) filter (where price >= 1000000)
      |    AS rank3_bidders,
      |  count(distinct auction) AS total_auctions,
      |  count(distinct auction) filter (where price < 10000)
      |    AS rank1_auctions,
      |  count(distinct auction) filter (where price >= 10000 and
      |    price < 1000000) AS rank2_auctions,
      |  count(distinct auction) filter (where price >= 1000000)
      |    AS rank3_auctions
      |FROM bid
      |GROUP BY channel, CAST(date_time AS DATE);
      |CREATE VIEW q17 AS
      |SELECT auction, CAST(date_time AS DATE) as "day",
      |  count(*) AS total_bids,
      |  count(*) filter (where price < 10000) AS rank1_bids,
      |  count(*) filter (where price >= 10000 and price < 1000000)
      |    AS rank2_bids,
      |  count(*) filter (where price >= 1000000) AS rank3_bids,
      |  min(price) AS min_price, max(price) AS max_price,
      |  avg(price) AS avg_price, sum(price) AS sum_price
      |FROM bid
      |GROUP BY auction, CAST(date_time AS DATE);
      |CREATE VIEW q18 AS
      |SELECT auction, bidder, price, channel, url, date_time, extra
      | FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY bidder, auction
      |         ORDER BY date_time DESC) AS rank_number
      |       FROM bid)
      | WHERE rank_number <= 1;
      |CREATE VIEW q19 AS
      |SELECT * FROM
      |(SELECT *, ROW_NUMBER() OVER (PARTITION BY auction
      |   ORDER BY price DESC) AS rank_number FROM bid)
      |WHERE rank_number <= 10;
      |CREATE VIEW q20 AS
      |SELECT
      |  auction, bidder, price, channel, url, B.date_time, B.extra,
      |  itemName, description, initialBid, reserve,
      |  A.date_time as AdateTime, expires, seller, category,
      |  A.extra as Aextra
      |FROM bid AS B INNER JOIN auction AS A on B.auction = A.id
      |WHERE A.category = 10;
      |CREATE VIEW q22 AS
      |SELECT auction, bidder, price, channel,
      |  SPLIT_INDEX(url, '/', 3) as dir1,
      |  SPLIT_INDEX(url, '/', 4) as dir2,
      |  SPLIT_INDEX(url, '/', 5) as dir3 FROM bid;
      |""".stripMargin

  // One stepped pipeline build per session; what the memo KEEPS is a
  // driver-local INTERNAL-ROW snapshot of each graded view's final
  // state, not the live pipeline: the bench drops caches between rows
  // (dropCaches unpersists every RDD of the shared context), which
  // would tear the lazy localCheckpoint chains out from under the 16
  // follow-on rows — a LocalRelation snapshot is immune, and the
  // follow-on reads become O(rows) driver-local projections instead of
  // re-materializations. All build + snapshot cost stays inside the
  // FIRST nexmark row's timed region, like the live-pipeline form.
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      Map[String, (Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
        Array[org.apache.spark.sql.catalyst.InternalRow])]]()

  private def viewSnapshots(spark: SparkSession): Map[String,
      (Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
       Array[org.apache.spark.sql.catalyst.InternalRow])] =
    memo.computeIfAbsent(spark, s0 => {
      val pipe = pipeline(s0)
      // the 17 final-state reads are independent chains of lazy
      // localCheckpoints — overlap them from a bounded pool (guide
      // §2.6). Each read materializes only its own view's chain; the
      // shared table frames are eager checkpoints, so concurrent
      // first-touch recompute cannot diverge.
      Par.map(defs, Par.width(s0)) { d =>
        d.view -> org.apache.spark.sql.graft.Shims.internalRows(
          pipe.adHoc(s"SELECT * FROM ${d.view}"))
      }.toMap
    })

  private def pipeline(s0: SparkSession): graft.runtime.Pipeline = {
      // the 3-step IVM build is REAL parallel compute (q5's double-HOP
      // explodes bid 5× before its self-join) — a measured A/B of a
      // fixture-sized 4-way shuffle pin ran 3.7× SLOWER than the
      // session's core-count width (260 → 641 task-s), so the build
      // keeps the caller's width. A child session still isolates the
      // pipeline's temp views from the caller's catalog.
      val s = s0.newSession()
      graft.functions.Registry.registerAll(s)
      val pipe = graft.runtime.Pipeline(s, program)
      val frames = Map(
        "person" -> s.sql(s"WITH ${genCtes(duck = false)} " +
          "SELECT * FROM person"),
        "auction" -> s.sql(s"WITH ${genCtes(duck = false)} " +
          "SELECT * FROM auction"),
        "bid" -> s.sql(s"WITH ${genCtes(duck = false)} " +
          "SELECT * FROM bid")).map { case (n, df) =>
        n -> df.localCheckpoint(true)
      }
      import org.apache.spark.sql.functions._
      def slice(df: DataFrame, k: Int): DataFrame =
        df.where(pmod(hash(df.columns.map(col): _*), lit(3)) === k)
      // three steps with a retraction wave: slice 0+1, then slice 2
      // with slice 0 RETRACTED, then slice 0 back — every view
      // maintains real deletions before the graded final state
      pipe.step(frames.map { case (n, f) =>
        n -> ZSets.lift(slice(f, 0).unionByName(slice(f, 1))) })
      pipe.step(frames.map { case (n, f) =>
        n -> ZSets.lift(slice(f, 2)).unionByName(
          ZSets.negate(ZSets.lift(slice(f, 0)))) })
      pipe.step(frames.map { case (n, f) => n -> ZSets.lift(slice(f, 0)) })
      pipe
  }

  // dev introspection for tools.Scratch phase timing (no graded use)
  private[graft] def programSql: String = program
  private[graft] def gradedViews: Seq[String] = defs.map(_.view)
  private[graft] def genFrames(s: SparkSession)
      : Map[String, org.apache.spark.sql.DataFrame] =
    Seq("person", "auction", "bid").map(n =>
      n -> s.sql(s"WITH ${genCtes(duck = false)} SELECT * FROM $n")
        .localCheckpoint(true)).toMap

  /** Graded wrapper projections: timestamps emit as epoch millis
    * (cross-engine-stable), DECIMAL money as DOUBLE. The same wrapper
    * text runs over the engine view (adHoc) and the oracle CTE.
    */
  private def wrap(duck: Boolean, view: String, cols: String): String = {
    val msRe = """MS\(([^)]*)\)""".r
    val projected = msRe.replaceAllIn(cols, m =>
      if (duck) s"epoch_ms(${m.group(1)})"
      // session tz is UTC, so the NTZ→instant cast is the identity
      else s"unix_millis(CAST(${m.group(1)} AS TIMESTAMP))")
    s"SELECT $projected FROM $view"
  }

  private case class NQ(name: String, view: String, cols: String,
      oracleView: String)

  /** DuckDB spellings of the non-portable views (window functions by
    * epoch arithmetic; Calcite's integral AVG via `//`).
    */
  private def duckViews: Map[String, String] = Map(
    "q4" -> """SELECT Q.category,
              |  CAST(SUM(Q.final) // COUNT(*) AS BIGINT) AS av
              |FROM (SELECT MAX(B.price) AS final, A.category
              |  FROM auction A, bid B
              |  WHERE A.id = B.auction
              |    AND B.date_time BETWEEN A.date_time AND A.expires
              |  GROUP BY A.id, A.category) Q
              |GROUP BY Q.category""".stripMargin,
    "q5" -> """SELECT AuctionBids.auction, AuctionBids.num FROM (
              |  SELECT auction, count(*) AS num, ws AS starttime
              |  FROM (SELECT auction,
              |    (epoch_ms(date_time) // 2000 - k.range) * 2000 AS ws
              |    FROM bid, range(0, 5) k
              |    WHERE (epoch_ms(date_time) // 2000 - k.range) * 2000
              |      + 10000 > epoch_ms(date_time)) hb
              |  GROUP BY auction, ws) AS AuctionBids
              |JOIN (
              |  SELECT max(num) AS maxn, starttime FROM (
              |    SELECT auction, count(*) AS num, ws AS starttime
              |    FROM (SELECT auction,
              |      (epoch_ms(date_time) // 2000 - k.range) * 2000 AS ws
              |      FROM bid, range(0, 5) k
              |      WHERE (epoch_ms(date_time) // 2000 - k.range) * 2000
              |        + 10000 > epoch_ms(date_time)) hb2
              |    GROUP BY auction, ws) CountBids
              |  GROUP BY starttime) AS MaxBids
              |ON AuctionBids.starttime = MaxBids.starttime
              |  AND AuctionBids.num >= MaxBids.maxn""".stripMargin,
    "q7" -> """SELECT B.auction, B.price, B.bidder, B.date_time, B.extra
              |FROM bid B JOIN (
              |  SELECT MAX(price) AS maxprice,
              |    epoch_ms(epoch_ms(date_time) // 10000 * 10000)
              |      AS date_time
              |  FROM bid
              |  GROUP BY epoch_ms(date_time) // 10000 * 10000) B1
              |ON B.price = B1.maxprice
              |WHERE B.date_time
              |  BETWEEN B1.date_time - INTERVAL 10 SECOND
              |  AND B1.date_time""".stripMargin,
    "q8" -> """SELECT P.id, P.name, P.starttime FROM (
              |  SELECT id, name,
              |    epoch_ms(epoch_ms(date_time) // 10000 * 10000)
              |      AS starttime
              |  FROM person GROUP BY id, name,
              |    epoch_ms(date_time) // 10000 * 10000) P
              |JOIN (
              |  SELECT seller,
              |    epoch_ms(epoch_ms(date_time) // 10000 * 10000)
              |      AS starttime
              |  FROM auction GROUP BY seller,
              |    epoch_ms(date_time) // 10000 * 10000) A
              |ON P.id = A.seller AND P.starttime = A.starttime""".stripMargin,
    "q14" -> """SELECT auction, bidder, 0.908 * price as price,
              |  CASE
              |    WHEN HOUR(date_time) >= 8 AND HOUR(date_time) <= 18
              |      THEN 'dayTime'
              |    WHEN HOUR(date_time) <= 6 OR HOUR(date_time) >= 20
              |      THEN 'nightTime'
              |    ELSE 'otherTime' END AS bidTimeType,
              |  date_time, extra,
              |  LENGTH(extra) - LENGTH(REPLACE(extra, 'c', ''))
              |    AS c_counts
              |FROM bid
              |WHERE 0.908 * price > 1000000
              |  AND 0.908 * price < 50000000""".stripMargin,
    // FORMAT_DATE is strftime-style in the reference (datetime.md:
    // '%H:%M'); q16's 'HH:mm' has no % directives, so it renders
    // LITERALLY in the reference engine — the oracle mirrors that
    "q16" -> """SELECT channel, CAST(date_time AS DATE) as day,
              |  'HH:mm' as minute,
              |  count(*) AS total_bids,
              |  count(*) filter (where price < 10000) AS rank1_bids,
              |  count(*) filter (where price >= 10000 and
              |    price < 1000000) AS rank2_bids,
              |  count(*) filter (where price >= 1000000) AS rank3_bids,
              |  count(distinct bidder) AS total_bidders,
              |  count(distinct bidder) filter (where price < 10000)
              |    AS rank1_bidders,
              |  count(distinct bidder) filter (where price >= 10000 and
              |    price < 1000000) AS rank2_bidders,
              |  count(distinct bidder) filter (where price >= 1000000)
              |    AS rank3_bidders,
              |  count(distinct auction) AS total_auctions,
              |  count(distinct auction) filter (where price < 10000)
              |    AS rank1_auctions,
              |  count(distinct auction) filter (where price >= 10000 and
              |    price < 1000000) AS rank2_auctions,
              |  count(distinct auction) filter (where price >= 1000000)
              |    AS rank3_auctions
              |FROM bid GROUP BY channel, CAST(date_time AS DATE)""".stripMargin,
    "q17" -> """SELECT auction, CAST(date_time AS DATE) as day,
              |  count(*) AS total_bids,
              |  count(*) filter (where price < 10000) AS rank1_bids,
              |  count(*) filter (where price >= 10000 and
              |    price < 1000000) AS rank2_bids,
              |  count(*) filter (where price >= 1000000) AS rank3_bids,
              |  min(price) AS min_price, max(price) AS max_price,
              |  CAST(SUM(price) // COUNT(*) AS BIGINT) AS avg_price,
              |  CAST(sum(price) AS BIGINT) AS sum_price
              |FROM bid GROUP BY auction, CAST(date_time AS DATE)""".stripMargin,
    "q22" -> """SELECT auction, bidder, price, channel,
              |  string_split(url, '/')[4] as dir1,
              |  string_split(url, '/')[5] as dir2,
              |  string_split(url, '/')[6] as dir3 FROM bid""".stripMargin
  )

  /** (row name, engine view, graded projection, oracle view body).
    * Projections use MS(col) for epoch-millis conversion and keep
    * column names aligned between the two engines.
    */
  private val defs: Seq[NQ] = {
    def same(v: String) = s"SELECT * FROM $v" // oracle re-derives below
    Seq(
      NQ("nexmark_q0", "q0",
        "auction, bidder, price, MS(date_time) AS t, extra",
        "SELECT auction, bidder, price, date_time, extra FROM bid"),
      NQ("nexmark_q1", "q1",
        "auction, bidder, CAST(price AS DOUBLE) AS price, " +
          "MS(date_time) AS t, extra",
        "SELECT auction, bidder, 0.908 * price AS price, date_time, " +
          "extra FROM bid"),
      NQ("nexmark_q2", "q2", "auction, price",
        "SELECT auction, price FROM bid WHERE auction % 123 = 0"),
      NQ("nexmark_q3", "q3", "name, city, state, id",
        "SELECT P.name, P.city, P.state, A.id " +
          "FROM auction A JOIN person P ON A.seller = P.id " +
          "WHERE A.category = 10 AND P.state IN ('OR','ID','CA')"),
      NQ("nexmark_q4", "q4", "*", duckViews("q4")),
      NQ("nexmark_q5", "q5", "auction, num", duckViews("q5")),
      NQ("nexmark_q7", "q7",
        "auction, price, bidder, MS(date_time) AS t, extra",
        duckViews("q7")),
      NQ("nexmark_q8", "q8", "id, name, MS(starttime) AS st",
        duckViews("q8")),
      NQ("nexmark_q9", "q9",
        "id, itemName, description, initialBid, reserve, " +
          "MS(date_time) AS t, MS(expires) AS e, seller, category, " +
          "extra, auction, bidder, price, MS(bid_dateTime) AS bt, " +
          "bid_extra",
        """SELECT id, itemName, description, initialBid, reserve,
          |  date_time, expires, seller, category, extra,
          |  auction, bidder, price, bid_dateTime, bid_extra
          |FROM (SELECT A.*, B.auction, B.bidder, B.price,
          |    B.date_time AS bid_dateTime, B.extra AS bid_extra,
          |    ROW_NUMBER() OVER (PARTITION BY A.id
          |      ORDER BY B.price DESC, B.date_time ASC) AS rownum
          |  FROM auction A, bid B
          |  WHERE A.id = B.auction
          |    AND B.date_time BETWEEN A.date_time AND A.expires)
          |WHERE rownum <= 1""".stripMargin),
      NQ("nexmark_q14", "q14",
        "auction, bidder, CAST(price AS DOUBLE) AS price, bidTimeType, " +
          "MS(date_time) AS t, extra, c_counts",
        duckViews("q14")),
      NQ("nexmark_q15", "q15", "*", {
        val v = program.split("CREATE VIEW q15 AS")(1)
          .split("CREATE VIEW")(0).trim.stripSuffix(";")
          .replace("as \"day\"", "as day")
        v
      }),
      NQ("nexmark_q16", "q16", "*", duckViews("q16")),
      NQ("nexmark_q17", "q17", "*", duckViews("q17")),
      NQ("nexmark_q18", "q18",
        "auction, bidder, price, channel, url, MS(date_time) AS t, extra",
        """SELECT auction, bidder, price, channel, url, date_time, extra
          |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY bidder,
          |    auction ORDER BY date_time DESC) AS rank_number FROM bid)
          |WHERE rank_number <= 1""".stripMargin),
      NQ("nexmark_q19", "q19",
        "auction, bidder, price, channel, url, MS(date_time) AS t, " +
          "extra, rank_number",
        """SELECT auction, bidder, price, channel, url, date_time,
          |  extra, rank_number
          |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY auction
          |    ORDER BY price DESC) AS rank_number FROM bid)
          |WHERE rank_number <= 10""".stripMargin),
      NQ("nexmark_q20", "q20",
        "auction, bidder, price, channel, url, MS(date_time) AS t, " +
          "extra, itemName, description, initialBid, reserve, " +
          "MS(AdateTime) AS at, MS(expires) AS e, seller, category, " +
          "Aextra",
        """SELECT auction, bidder, price, channel, url, B.date_time,
          |  B.extra, itemName, description, initialBid, reserve,
          |  A.date_time AS AdateTime, expires, seller, category,
          |  A.extra AS Aextra
          |FROM bid B JOIN auction A ON B.auction = A.id
          |WHERE A.category = 10""".stripMargin),
      NQ("nexmark_q22", "q22", "*", duckViews("q22"))
    )
  }

  def queries: Seq[Q] = defs.map { d =>
    val oracle = s"WITH ${genCtes(duck = true)}, __v AS (" +
      d.oracleView + ") " + wrap(duck = true, "__v", d.cols)
    Q(d.name, oracle) { (s, _) =>
      val (attrs, rows) = viewSnapshots(s)(d.view)
      org.apache.spark.sql.graft.Shims.fromInternalRows(s, attrs, rows)
        .createOrReplaceTempView(s"__nx_${d.view}")
      s.sql(wrap(duck = false, s"__nx_${d.view}", d.cols))
    }
  }
}
