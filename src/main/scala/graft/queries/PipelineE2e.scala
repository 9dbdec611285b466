package graft.queries

import org.apache.spark.sql.functions._

import graft.runtime.Pipeline
import graft.zset.ZSets
import QB._

/** End-to-end program-runner queries, graded by the driver: a full DDL
  * program (CREATE TABLE / CREATE VIEW / DECLARE RECURSIVE VIEW) runs
  * through [[graft.runtime.Pipeline.step]] as a sequence of Z-set delta
  * batches with retractions, and the ORACLE is the equivalent batch SQL
  * over the final snapshot — grading the IVM planner, the recursive
  * fixpoint group, and the runner's state integration themselves (the
  * reference's end-to-end contract, README.md:67-70), not just the
  * operator library the inc_* queries exercise directly.
  */
object PipelineE2e {

  val queries: Seq[Q] = Seq(
    // TPC-H Q1 maintained INCREMENTALLY: the full eight-column pricing
    // summary (exact-decimal sums, ROUND-normalized money, avg via
    // sum/count) as a pipeline view, fed inserts then a late wave with
    // retractions; the oracle is the batch Q1 over the surviving rows.
    // This is the engine's headline contract — the canonical analytics
    // query kept current under a changing fact table.
    Q(
      "pipeline_tpch_q1",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,4)))), 4)
        |    AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(10,4)) *
        |    CAST(1 - CAST(l_discount AS DECIMAL(5,4)) AS DECIMAL(5,4)) *
        |    CAST(1 + CAST(l_tax AS DECIMAL(5,4)) AS DECIMAL(5,4))), 4)
        |    AS DECIMAL(18,4)) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) /
        |    COUNT(l_quantity) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'
        |  AND l_orderkey % 7 <> 0
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      val viewSql =
        """SELECT l_returnflag, l_linestatus,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
          |    AS sum_qty,
          |  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
          |    (1 - CAST(l_discount AS DECIMAL(18,4)))), 4)
          |    AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
          |  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(10,4)) *
          |    CAST(1 - CAST(l_discount AS DECIMAL(5,4)) AS DECIMAL(5,4)) *
          |    CAST(1 + CAST(l_tax AS DECIMAL(5,4)) AS DECIMAL(5,4))), 4)
          |    AS DECIMAL(18,4)) AS DOUBLE) AS sum_charge,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) /
          |    COUNT(l_quantity) AS avg_qty,
          |  COUNT(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '2001-08-06 00:00:00'
          |GROUP BY l_returnflag, l_linestatus""".stripMargin
      val prog =
        """CREATE TABLE lineitem (l_orderkey BIGINT, l_quantity DOUBLE,
          | l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE,
          | l_returnflag VARCHAR, l_linestatus VARCHAR,
          | l_shipdate TIMESTAMP);
          |""".stripMargin + s"CREATE VIEW q1 AS $viewSql;"
      val pipe = Pipeline(s, prog)
      // no eager fixture checkpoint: each step's delta consolidation
      // scans parquet directly (pruned columns, pushed key filter) —
      // cheaper than materializing the whole table up front, and the
      // loadRaw form skips the scan fan-out exchange a small delta
      // never amortizes
      val li = tRaw(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice",
          "l_discount", "l_tax", "l_returnflag", "l_linestatus",
          "l_shipdate")
      // step 1: even orderkeys; step 2: odd orderkeys plus retraction of
      // every %7 row already inserted — groups must re-derive exactly
      pipe.step(Map("lineitem" ->
        ZSets.lift(li.filter(col("l_orderkey") % 2 === 0))))
      pipe.step(Map("lineitem" ->
        ZSets.lift(li.filter(col("l_orderkey") % 2 === 1)).unionByName(
          ZSets.negate(ZSets.lift(li.filter(col("l_orderkey") % 7 === 0))))))
      pipe.adHoc("SELECT * FROM q1")
    },

    // TPC-H Q5 maintained INCREMENTALLY: the six-table star (two fact
    // sides stepping with retractions, four dimensions seeded once)
    // through the AggOverMulti IVM shape; oracle = batch Q5 over the
    // surviving rows.
    Q(
      "pipeline_tpch_q5",
      """SELECT n_name,
        |  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,4)))), 4)
        |    AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_orderkey % 5 <> 0
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      val viewSql =
        """SELECT n_name,
          |  CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
          |    (1 - CAST(l_discount AS DECIMAL(18,4)))), 4)
          |    AS DECIMAL(18,4)) AS DOUBLE) AS revenue
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |  AND c_nationkey = s_nationkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          |GROUP BY n_name""".stripMargin
      val prog =
        """CREATE TABLE customer (c_custkey BIGINT, c_nationkey INT);
          |CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT,
          | o_orderdate TIMESTAMP);
          |CREATE TABLE lineitem (l_orderkey BIGINT, l_suppkey BIGINT,
          | l_extendedprice DOUBLE, l_discount DOUBLE);
          |CREATE TABLE supplier (s_suppkey BIGINT, s_nationkey INT);
          |CREATE TABLE nation (n_nationkey INT, n_name VARCHAR,
          | n_regionkey INT);
          |CREATE TABLE region (r_regionkey INT, r_name VARCHAR);
          |""".stripMargin + s"CREATE VIEW q5 AS $viewSql;"
      val pipe = Pipeline(s, prog)
      // direct pruned/pushed parquet scans per delta slice (see q1)
      val li = tRaw(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val o = tRaw(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
      // step 1: dims + even fact keys; step 2: odd keys on both fact
      // sides + retraction of every %5 lineitem — insert and retract
      // deltas hit the standing multi-join in the same step
      pipe.step(Map(
        "customer" -> ZSets.lift(
          tRaw(s, dir, "customer").select("c_custkey", "c_nationkey")),
        "supplier" -> ZSets.lift(
          tRaw(s, dir, "supplier").select("s_suppkey", "s_nationkey")),
        "nation" -> ZSets.lift(
          tRaw(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")),
        "region" -> ZSets.lift(
          tRaw(s, dir, "region").select("r_regionkey", "r_name")),
        "orders" -> ZSets.lift(o.filter(col("o_orderkey") % 2 === 0)),
        "lineitem" -> ZSets.lift(li.filter(col("l_orderkey") % 2 === 0))))
      pipe.step(Map(
        "orders" -> ZSets.lift(o.filter(col("o_orderkey") % 2 === 1)),
        "lineitem" -> ZSets.lift(li.filter(col("l_orderkey") % 2 === 1))
          .unionByName(ZSets.negate(
            ZSets.lift(li.filter(col("l_orderkey") % 5 === 0))))))
      pipe.adHoc("SELECT * FROM q5")
    },

    // The full user-defined surface graded through the oracle: the DDL
    // program declares CREATE TYPE (used in the function's RETURNS and
    // body), a SQL-bodied CREATE FUNCTION (inlined by Spark's SQL
    // function support), and CREATE LINEAR AGGREGATE whose
    // implementation is a session-registered weighted Aggregator
    // (external-body contract, udf.md / grammar.md:278-293). The view
    // uses all three and is maintained INCREMENTALLY through a
    // retraction step; the oracle re-derives type, function and
    // aggregate inline.
    Q(
      "pipeline_udf",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,4)))
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  SUM(l_quantity) AS wqty,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_orderkey % 9 <> 0
        |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      // external-body implementation for the declared LINEAR AGGREGATE:
      // Σ f(row)·w with unit weights at the SQL surface (the Z-set
      // weighting is the runner's concern); l_quantity is whole-valued,
      // so the double sum is exact in any order
      s.udf.register("wsum", org.apache.spark.sql.functions.udaf(
        graft.functions.WeightedAggs.linear[Double](identity, _ => 1L),
        org.apache.spark.sql.Encoders.scalaDouble))
      val prog =
        """CREATE TYPE money AS DECIMAL(18, 4);
          |CREATE FUNCTION disc_price(p DOUBLE, d DOUBLE) RETURNS money
          |  AS CAST(CAST(p AS money) * (1 - CAST(d AS money)) AS money);
          |CREATE LINEAR AGGREGATE wsum(v DOUBLE) RETURNS DOUBLE;
          |CREATE TABLE lineitem (l_orderkey BIGINT, l_quantity DOUBLE,
          | l_extendedprice DOUBLE, l_discount DOUBLE,
          | l_returnflag VARCHAR);
          |CREATE VIEW rev AS
          |  SELECT l_returnflag,
          |    CAST(SUM(disc_price(l_extendedprice, l_discount))
          |      AS DOUBLE) AS revenue,
          |    wsum(l_quantity) AS wqty,
          |    COUNT(*) AS n
          |  FROM lineitem GROUP BY l_returnflag;""".stripMargin
      val pipe = Pipeline(s, prog)
      val li = tRaw(s, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice",
          "l_discount", "l_returnflag")
      pipe.step(Map("lineitem" ->
        ZSets.lift(li.filter(col("l_orderkey") % 2 === 0))))
      pipe.step(Map("lineitem" ->
        ZSets.lift(li.filter(col("l_orderkey") % 2 === 1)).unionByName(
          ZSets.negate(ZSets.lift(li.filter(col("l_orderkey") % 9 === 0))))))
      pipe.adHoc("SELECT * FROM rev")
    },

    // Aggregate directly over a join, maintained by the AggOverMulti
    // composite shape (hidden join-body Z-set + touched-group re-agg)
    // under a 3-step orders / 2-step customer delta schedule with
    // retractions on both sides.
    Q(
      "pipeline_ivm",
      """SELECT c_name, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey % 10 <> 0 AND c_custkey % 17 <> 0
        |  AND o_custkey <= 1500 AND c_custkey <= 1500
        |GROUP BY c_name""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE);
          |CREATE TABLE customer (c_custkey BIGINT, c_name VARCHAR);
          |CREATE VIEW spend AS
          |  SELECT c_name, COUNT(*) AS n,
          |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
          |  FROM orders JOIN customer ON o_custkey = c_custkey
          |  GROUP BY c_name;""".stripMargin
      val pipe = Pipeline(s, prog)
      val o = tRaw(s, dir, "orders").filter(col("o_custkey") <= 1500)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .localCheckpoint(true)
      val c = tRaw(s, dir, "customer").filter(col("c_custkey") <= 1500)
        .select("c_custkey", "c_name").localCheckpoint(true)
      // two steps (each step pays a fixed multi-job cost in local mode —
      // the schedule exercises inserts, then late inserts + retractions
      // on BOTH join sides, which is the full delta-rule surface):
      // step 2 retracts the %10 orders and the %17 customers, whose
      // groups emit tombstones for already-joined rows
      val oB = (m: Int) => ZSets.lift(o.filter(col("o_orderkey") % 2 === m))
      val steps = Seq(
        Map("orders" -> oB(0),
          "customer" -> ZSets.lift(c.filter(col("c_custkey") % 2 === 0))),
        Map("orders" -> oB(1).unionByName(ZSets.negate(
            ZSets.lift(o.filter(col("o_orderkey") % 10 === 0)))),
          "customer" -> ZSets.lift(c.filter(col("c_custkey") % 2 === 1))
            .unionByName(ZSets.negate(
              ZSets.lift(c.filter(col("c_custkey") % 17 === 0))))))
      steps.foreach(pipe.step)
      pipe.adHoc("SELECT * FROM spend")
    },

    // DECLARE RECURSIVE VIEW through the runner: transitive closure over
    // an edge table fed in two insert steps plus a retraction step that
    // severs paths (the recompute-diff fixpoint is exact under
    // retraction); oracle = DuckDB WITH RECURSIVE over the surviving
    // edges.
    Q(
      "pipeline_recursive",
      """WITH RECURSIVE edges AS (
        |  SELECT n_nationkey AS src, n_nationkey + 5 AS dst FROM nation
        |  WHERE n_nationkey + 5 <= 24 AND n_nationkey % 4 <> 0),
        |closure(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT c.src, e.dst FROM closure c JOIN edges e ON c.dst = e.src)
        |SELECT src, dst FROM closure""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE edges (src INT, dst INT);
          |DECLARE RECURSIVE VIEW closure (src INT, dst INT);
          |CREATE VIEW closure AS
          |  SELECT src, dst FROM edges
          |  UNION
          |  SELECT c.src, e.dst FROM closure c JOIN edges e ON c.dst = e.src;""".stripMargin
      val pipe = Pipeline(s, prog)
      val edges = tRaw(s, dir, "nation")
        .filter(col("n_nationkey") + 5 <= 24)
        .select(col("n_nationkey").as("src"),
          (col("n_nationkey") + 5).as("dst"))
        .localCheckpoint(true)
      pipe.step(Map("edges" -> ZSets.lift(edges.filter(col("src") % 2 === 0))))
      // late inserts + a retraction severing paths in the same step
      pipe.step(Map("edges" ->
        ZSets.lift(edges.filter(col("src") % 2 === 1)).unionByName(
          ZSets.negate(ZSets.lift(edges.filter(col("src") % 4 === 0))))))
      pipe.adHoc("SELECT * FROM closure")
    },

    // Incremental recursion: an insert-only 3-step schedule keeps the
    // closure group on the semi-naive CONTINUATION path (asserted via
    // lastRecursiveMode — never a from-scratch fixpoint), extending the
    // previous totals with only the paths through each step's new edges;
    // oracle = DuckDB WITH RECURSIVE over the full chain.
    Q(
      "pipeline_rec_inc",
      """WITH RECURSIVE edges AS (
        |  SELECT n_nationkey AS src, n_nationkey + 1 AS dst FROM nation
        |  WHERE n_nationkey < 12),
        |closure(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT c.src, e.dst FROM closure c JOIN edges e ON c.dst = e.src)
        |SELECT src, dst FROM closure""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE edges (src INT, dst INT);
          |DECLARE RECURSIVE VIEW closure (src INT, dst INT);
          |CREATE VIEW closure AS
          |  SELECT src, dst FROM edges
          |  UNION
          |  SELECT c.src, e.dst FROM closure c JOIN edges e ON c.dst = e.src;"""
          .stripMargin
      val pipe = Pipeline(s, prog)
      val edges = tRaw(s, dir, "nation").filter(col("n_nationkey") < 12)
        .select(col("n_nationkey").cast("int").as("src"),
          (col("n_nationkey") + 1).cast("int").as("dst"))
        .localCheckpoint(true)
      (0 until 3).foreach { m =>
        pipe.step(Map("edges" ->
          ZSets.lift(edges.filter(col("src") % 3 === m))))
        require(pipe.lastRecursiveMode == "incremental",
          "insert-only steps must take the incremental recursion path")
      }
      pipe.adHoc("SELECT * FROM closure")
    },

    // Semi/anti-join IVM through the runner: EXISTS / NOT EXISTS views
    // maintained by the SemiAnti indicator delta rule (distinct right-key
    // presence transitions) under a schedule that inserts and retracts on
    // BOTH sides — customer retractions flip indicator keys, moving order
    // rows between the semi and anti views; oracle = DuckDB EXISTS over
    // the surviving rows.
    Q(
      "pipeline_semi_anti",
      """WITH o AS (SELECT o_orderkey, o_custkey FROM orders
        |           WHERE o_orderkey % 9 <> 0),
        |     c AS (SELECT c_custkey FROM customer WHERE c_custkey % 13 <> 0)
        |SELECT 'semi' AS side, o_orderkey, o_custkey FROM o
        |WHERE EXISTS (SELECT 1 FROM c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'anti' AS side, o_orderkey, o_custkey FROM o
        |WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.c_custkey = o.o_custkey)"""
        .stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT);
          |CREATE TABLE customer (c_custkey BIGINT);
          |CREATE VIEW has_cust AS
          |  SELECT o_orderkey, o_custkey FROM orders o
          |  WHERE EXISTS (SELECT 1 FROM customer c
          |                WHERE c.c_custkey = o.o_custkey);
          |CREATE VIEW no_cust AS
          |  SELECT o_orderkey, o_custkey FROM orders o
          |  WHERE NOT EXISTS (SELECT 1 FROM customer c
          |                    WHERE c.c_custkey = o.o_custkey);""".stripMargin
      val pipe = Pipeline(s, prog)
      // honesty guard: these must route through the SemiAnti delta rule,
      // not the recompute-diff fallback
      require(pipe.shapeOf("has_cust")
        .isInstanceOf[graft.incremental.Ivm.SemiAnti]
        && pipe.shapeOf("no_cust")
          .isInstanceOf[graft.incremental.Ivm.SemiAnti],
        "semi/anti views must classify SemiAnti")
      val o = tRaw(s, dir, "orders").select("o_orderkey", "o_custkey")
        .localCheckpoint(true)
      val c = tRaw(s, dir, "customer").select("c_custkey").localCheckpoint(true)
      val steps = Seq(
        Map(
          "orders" -> ZSets.lift(o.filter(col("o_orderkey") % 2 === 0)),
          "customer" -> ZSets.lift(c.filter(col("c_custkey") % 2 === 0))),
        Map(
          "orders" -> ZSets.lift(o.filter(col("o_orderkey") % 2 === 1))
            .unionByName(ZSets.negate(
              ZSets.lift(o.filter(col("o_orderkey") % 9 === 0)))),
          "customer" -> ZSets.lift(c.filter(col("c_custkey") % 2 === 1))
            .unionByName(ZSets.negate(
              ZSets.lift(c.filter(col("c_custkey") % 13 === 0))))))
      steps.foreach(pipe.step)
      pipe.adHoc(
        """SELECT 'semi' AS side, o_orderkey, o_custkey FROM has_cust
          |UNION ALL
          |SELECT 'anti' AS side, o_orderkey, o_custkey FROM no_cust"""
          .stripMargin)
    },

    // Wire-format round trip, graded: every order emits an `insert`
    // envelope line and the %5 orders ALSO emit a `delete` line; decoding
    // through Envelopes.decodeJson and consolidating the Z-set must leave
    // exactly the %5<>0 rows — the reference's insert_delete JSON contract
    // (crates/feldera-types/src/format/json.rs:148-160).
    Q(
      "fmt_envelopes",
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_orderkey % 5 <> 0""".stripMargin) { (s, dir) =>
      val o = tRaw(s, dir, "orders").select("o_orderkey", "o_custkey")
      val body = to_json(struct(col("o_orderkey"), col("o_custkey")))
      val lines = o.select(
        concat(lit("""{"insert": """), body, lit("}")).as("value"))
        .unionByName(o.filter(col("o_orderkey") % 5 === 0).select(
          concat(lit("""{"delete": """), body, lit("}")).as("value")))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_custkey",
          org.apache.spark.sql.types.LongType)))
      ZSets.toMultiset(ZSets.consolidate(
        graft.sources.Envelopes.decodeJson(lines, schema, "insert_delete")))
    },

    // CSV record decode, graded: serialize rows to CSV lines (quoting the
    // string field), decode through Envelopes.decodeCsv, and match the
    // plain projection — insert-only records per the reference CSV input
    // (crates/adapters/src/format/csv.rs).
    Q(
      "fmt_csv",
      "SELECT c_custkey, c_name FROM customer") { (s, dir) =>
      val lines = tRaw(s, dir, "customer").select(concat_ws(",",
        col("c_custkey"),
        concat(lit("\""), col("c_name"), lit("\""))).as("value"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c_custkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c_name",
          org.apache.spark.sql.types.StringType)))
      graft.sources.Envelopes.decodeCsv(lines, schema).drop(ZSets.W)
    },

    // Avro wire-format round trip, graded (the last format family that
    // rested on specs alone): every order is encoded as a binary Avro
    // record (Envelopes.encodeAvro, the egress twin) and decoded back
    // as an insert (decodeAvro, crates/adapters/src/format/avro/), and
    // the %5 orders ALSO arrive as Debezium-over-Avro DELETE envelopes
    // ({before, op:'d'} with a nested row record — debezium.rs
    // semantics). Consolidating the union must leave exactly the %5<>0
    // rows; the oracle re-derives the survivors relationally.
    Q(
      "fmt_avro",
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_orderkey % 5 <> 0""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.{BinaryType, LongType,
        StructField, StructType}
      val rowSchemaJson =
        """{"type":"record","name":"OrderRow","fields":[
          |{"name":"o_orderkey","type":"long"},
          |{"name":"o_custkey","type":"long"}]}"""
          .stripMargin.replaceAll("\n", "")
      val envSchemaJson =
        ("""{"type":"record","name":"Envelope","fields":[
          |{"name":"before","type":["null",""" + rowSchemaJson +
          """],"default":null},
          |{"name":"after","type":["null","OrderRow"],"default":null},
          |{"name":"op","type":"string"}]}""")
          .stripMargin.replaceAll("\n", "")
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_custkey", LongType)))
      val o = tRaw(s, dir, "orders").select("o_orderkey", "o_custkey")
      // leg 1: plain binary Avro records — encode egress, decode ingest
      val ins = graft.sources.Envelopes.decodeAvro(
        graft.sources.Envelopes.encodeAvro(o, rowSchemaJson),
        schema, rowSchemaJson)
      // leg 2: the %5 orders re-arrive as Debezium-Avro 'd' envelopes
      // (nested before record), built per-partition with the same Avro
      // core the decoder uses
      val delRdd = o.filter(col("o_orderkey") % 5 === 0).rdd
        .mapPartitions { it =>
          val env = new org.apache.avro.Schema.Parser()
            .parse(envSchemaJson)
          val rowS = env.getField("before").schema().getTypes.get(1)
          val writer = new org.apache.avro.generic.GenericDatumWriter[
            org.apache.avro.generic.GenericRecord](env)
          val bos = new java.io.ByteArrayOutputStream()
          var enc: org.apache.avro.io.BinaryEncoder = null
          it.map { r =>
            val before =
              new org.apache.avro.generic.GenericData.Record(rowS)
            before.put("o_orderkey", r.getLong(0))
            before.put("o_custkey", r.getLong(1))
            val e = new org.apache.avro.generic.GenericData.Record(env)
            e.put("before", before)
            e.put("op", "d")
            bos.reset()
            enc = org.apache.avro.io.EncoderFactory.get()
              .binaryEncoder(bos, enc)
            writer.write(e, enc)
            enc.flush()
            org.apache.spark.sql.Row(bos.toByteArray: Any)
          }
        }
      val dels = graft.sources.Envelopes.decodeAvroDebezium(
        s.createDataFrame(delRdd,
          StructType(Seq(StructField("value", BinaryType)))),
        schema, envSchemaJson)
      ZSets.toMultiset(ZSets.consolidate(ins.unionByName(dels)))
    },

    // LATENESS + ERROR_VIEW end-to-end (streaming.md LATENESS;
    // system.md ERROR_VIEW): a two-chunk schedule where chunk 2 carries
    // rows older than the waterline chunk 1 established (max ts − 1 day).
    // The runner must discard exactly those rows into error_view and
    // aggregate the admitted set; the oracle replays the chunk schedule
    // and waterline arithmetic relationally.
    Q(
      "pipeline_lateness",
      """WITH e AS (SELECT event_id, ts, value FROM events),
        |b1 AS (SELECT * FROM e WHERE event_id % 2 = 0),
        |w AS (SELECT MAX(ts) - INTERVAL 1 DAY AS cutoff FROM b1),
        |b2 AS (SELECT e.* FROM e, w WHERE event_id % 2 = 1 AND ts >= cutoff),
        |adm AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2),
        |nl AS (SELECT COUNT(*) AS n_late FROM e, w
        |  WHERE event_id % 2 = 1 AND ts < cutoff)
        |SELECT CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_val,
        |  nl.n_late
        |FROM adm, nl
        |GROUP BY 1, nl.n_late""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE ev (
          |  ts TIMESTAMP LATENESS INTERVAL 1 DAY,
          |  value DOUBLE
          |);
          |CREATE VIEW daily AS
          |  SELECT unix_timestamp(ts) div 86400 AS day, COUNT(*) AS n,
          |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
          |  FROM ev GROUP BY unix_timestamp(ts) div 86400;""".stripMargin
      val pipe = Pipeline(s, prog)
      val ev = tRaw(s, dir, "events").select("event_id", "ts", "value")
        .localCheckpoint(true)
      def half(m: Int) =
        ZSets.lift(ev.filter(col("event_id") % 2 === m).drop("event_id"))
      pipe.step(Map("ev" -> half(0)))
      pipe.step(Map("ev" -> half(1)))
      pipe.adHoc("SELECT * FROM daily").crossJoin(broadcast(
        pipe.adHoc("SELECT COUNT(*) AS n_late FROM error_view")))
    },

    // Transactions (pipelines/transactions.md), graded end-to-end: three
    // ingest chunks buffer inside an open transaction (views hold their
    // pre-transaction state, which the result proves by capturing the
    // mid-transaction view row count), then commit applies the
    // cumulative delta as ONE atomic step. Oracle = the same split
    // replayed relationally: mid = chunk-0-only aggregate, final = all
    // chunks.
    Q(
      "pipeline_txn",
      """WITH o AS (SELECT o_custkey % 50 AS grp, o_totalprice AS v
        |           FROM orders WHERE o_orderkey <= 40000),
        |mid AS (SELECT COUNT(*) AS n FROM (
        |  SELECT grp FROM o WHERE grp % 4 = 0 GROUP BY grp)),
        |fin AS (SELECT grp, COUNT(*) AS n,
        |    CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS sv
        |  FROM o GROUP BY grp)
        |SELECT fin.grp, fin.n, fin.sv, mid.n AS mid_groups
        |FROM fin, mid""".stripMargin) { (s, dir) =>
      val prog =
        """CREATE TABLE o (grp BIGINT, v DOUBLE);
          |CREATE VIEW agg AS
          |  SELECT grp, COUNT(*) AS n,
          |    CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS sv
          |  FROM o GROUP BY grp;""".stripMargin
      val pipe = Pipeline(s, prog)
      val o = tRaw(s, dir, "orders").filter(col("o_orderkey") <= 40000)
        .select((col("o_custkey") % 50).as("grp"),
          col("o_totalprice").as("v"))
        .localCheckpoint(true)
      // committed baseline: the grp % 4 == 0 slice
      pipe.step(Map("o" -> ZSets.lift(o.filter(col("grp") % 4 === 0))))
      val id = pipe.startTransaction()
      (1 to 3).foreach(m =>
        pipe.step(Map("o" -> ZSets.lift(o.filter(col("grp") % 4 === m)))))
      // mid-transaction: the view still shows only the committed slice
      val mid = pipe.adHoc("SELECT COUNT(*) AS mid_groups FROM agg")
        .localCheckpoint(true)
      pipe.commitTransaction(id)
      pipe.adHoc("SELECT * FROM agg").crossJoin(broadcast(mid))
    },

    // Bootstrapping (pipelines/modifying.md), graded end-to-end: the
    // pipeline runs two steps under program v1, MIGRATES to v2 (the view
    // gains a filter + a projection change, a new view appears), then
    // runs a third step on the migrated pipeline. Table history carries
    // over without re-ingest; the oracle is plain batch SQL of the v2
    // program over all three chunks.
    Q(
      "pipeline_migrate",
      """WITH o AS (SELECT o_orderkey, o_custkey % 40 AS grp, o_totalprice AS v
        |           FROM orders WHERE o_orderkey <= 30000),
        |agg AS (SELECT grp, COUNT(*) AS n,
        |    CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS sv
        |  FROM o WHERE v >= 1000 GROUP BY grp),
        |hi AS (SELECT COUNT(*) AS n_hi FROM o WHERE v >= 100000)
        |SELECT agg.grp, agg.n, agg.sv, hi.n_hi FROM agg, hi""".stripMargin) {
      (s, dir) =>
      val prog1 =
        """CREATE TABLE o (o_orderkey BIGINT, grp BIGINT, v DOUBLE);
          |CREATE VIEW agg AS
          |  SELECT grp, COUNT(*) AS n,
          |    CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS sv
          |  FROM o GROUP BY grp;""".stripMargin
      // v2: agg gains a value filter; hi is new
      val prog2 =
        """CREATE TABLE o (o_orderkey BIGINT, grp BIGINT, v DOUBLE);
          |CREATE VIEW agg AS
          |  SELECT grp, COUNT(*) AS n,
          |    CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS sv
          |  FROM o WHERE v >= 1000 GROUP BY grp;
          |CREATE VIEW hi AS
          |  SELECT COUNT(*) AS n_hi FROM o WHERE v >= 100000;""".stripMargin
      val o = tRaw(s, dir, "orders").filter(col("o_orderkey") <= 30000)
        .select(col("o_orderkey"), (col("o_custkey") % 40).as("grp"),
          col("o_totalprice").as("v"))
        .localCheckpoint(true)
      val p1 = Pipeline(s, prog1)
      p1.step(Map("o" -> ZSets.lift(o.filter(col("o_orderkey") % 3 === 0))))
      p1.step(Map("o" -> ZSets.lift(o.filter(col("o_orderkey") % 3 === 1))))
      val (p2, bootstrap) = p1.migrate(prog2)
      require(bootstrap.keySet == Set("agg", "hi"),
        s"expected bootstrap deltas for the modified and new views, " +
          s"got ${bootstrap.keySet}")
      p2.step(Map("o" -> ZSets.lift(o.filter(col("o_orderkey") % 3 === 2))))
      p2.adHoc("SELECT * FROM agg").crossJoin(broadcast(
        p2.adHoc("SELECT * FROM hi")))
    },

    // Unique keys (connectors/unique_keys.md), graded end-to-end: a PK
    // table drives a view through an INDEXED file connector; each step's
    // output delta lands as atomic upsert envelopes ({"update": …}
    // instead of delete+insert pairs). The query returns the decoded
    // wire lines (op, k, v); the oracle re-derives the op per key
    // relationally from the two snapshots.
    Q(
      "pipeline_indexed_sink",
      """WITH s1 AS (SELECT o_orderkey AS k,
        |    CAST(FLOOR(o_totalprice) AS BIGINT) AS v
        |  FROM orders WHERE o_orderkey <= 2000),
        |s2 AS (SELECT o_orderkey AS k,
        |    CAST(FLOOR(o_totalprice) AS BIGINT)
        |      + CASE WHEN o_orderkey % 3 = 0 THEN 7 ELSE 0 END AS v
        |  FROM orders WHERE o_orderkey <= 2000 AND o_orderkey % 5 <> 0),
        |ops AS (
        |  SELECT 'insert' AS op, k, v FROM s1
        |  UNION ALL
        |  SELECT CASE WHEN s2.k IS NULL THEN 'delete'
        |              ELSE 'update' END AS op,
        |    s1.k, COALESCE(s2.v, s1.v) AS v
        |  FROM s1 LEFT JOIN s2 ON s1.k = s2.k
        |  WHERE s2.k IS NULL OR s2.v <> s1.v)
        |SELECT op, k, v FROM ops""".stripMargin) { (s, dir) =>
      val outDir = java.nio.file.Files
        .createTempDirectory("idx_sink").toString
      val prog =
        s"""CREATE TABLE kv (k BIGINT NOT NULL, v BIGINT, PRIMARY KEY (k));
           |CREATE VIEW cur WITH ('connectors' = '[
           |  {"index": "cur_idx",
           |   "transport": {"name": "file_output",
           |    "config": {"path": "$outDir/wire"}},
           |   "format": {"name": "json"}}]')
           |AS SELECT k, v FROM kv;
           |CREATE INDEX cur_idx ON cur(k);""".stripMargin
      val pipe = Pipeline(s, prog)
      val o = tRaw(s, dir, "orders").filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey").as("k"),
          floor(col("o_totalprice")).cast("long").as("v"))
        .localCheckpoint(true)
      // snapshot 1: every key; snapshot 2: %5 keys deleted, %3 bumped
      val s2 = o.filter(col("k") % 5 =!= 0)
        .withColumn("v", col("v") +
          when(col("k") % 3 === 0, 7L).otherwise(0L))
      def cmds(df: org.apache.spark.sql.DataFrame, del: Boolean) =
        df.withColumn("_deleted", lit(del))
      pipe.emitOutputs(pipe.step(Map("kv" -> cmds(o, del = false))))
      pipe.emitOutputs(pipe.step(Map("kv" ->
        cmds(s2, del = false).unionByName(
          cmds(o.filter(col("k") % 5 === 0), del = true)))))
      // decode the wire lines back: one row per envelope
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType)))
      val lines = s.read.text(s"$outDir/wire")
      Seq("insert", "update", "delete").map { op =>
        lines.select(get_json_object(col("value"), s"$$.$op").as("body"))
          .filter(col("body").isNotNull)
          .select(lit(op).as("op"),
            from_json(col("body"), schema).as("r"))
          .select(col("op"), col("r.k").as("k"), col("r.v").as("v"))
      }.reduce(_ unionByName _)
    }
  )
}
