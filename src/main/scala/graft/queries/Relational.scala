package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QB._

/** Row-level operators: map/projection, filter, flatmap (UNNEST), constants,
  * conditionals, casts. Reference circuit ops:
  * DBSPMapOperator.java:42, DBSPFilterOperator.java:41,
  * DBSPFlatMapOperator.java:41, DBSPConstantOperator.java:40 (SURVEY §2.2).
  * All are linear operators — in Spark they stay inside one
  * WholeStageCodegen span over the parquet scan, with the projection pruned
  * into ReadSchema and filters pushed to the scan (PushedFilters).
  */
object Relational {

  val queries: Seq[Q] = Seq(
    Q(
      "map_project",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS net_price,
        |  UPPER(l_returnflag) AS flag
        |FROM lineitem""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("net_price"),
        upper(col("l_returnflag")).as("flag"))
    },

    Q(
      "filter_where",
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_quantity > 30 AND l_discount <= 0.05 AND l_returnflag = 'R'""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_quantity") > 30 && col("l_discount") <= 0.05
            && col("l_returnflag") === "R")
          .select("l_orderkey", "l_linenumber", "l_quantity")
    },

    Q(
      "flatmap_unnest",
      """SELECT doc_id, word FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |) WHERE word <> ''""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
    },

    // UNNEST WITH ORDINALITY (reference: visitUncollect,
    // CalciteToDBSPCompiler.java:676) — posexplode; DuckDB zips parallel
    // unnests in one SELECT, giving the same (word, pos) pairs.
    Q(
      "flatmap_ordinality",
      """SELECT doc_id,
        |  unnest(string_split(text, ' ')) AS word,
        |  unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        |FROM documents WHERE doc_id < 100""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("p0", "word")))
        .select(col("doc_id"), col("word"),
          (col("p0") + 1).cast("long").as("pos"))
    },

    Q(
      "const_values",
      "SELECT * FROM (VALUES (1, 'alpha'), (2, 'beta'), (3, 'gamma')) AS t(id, tag)") {
      (s, dir) =>
        import s.implicits._
        s.createDataFrame(Seq((1, "alpha"), (2, "beta"), (3, "gamma")))
          .toDF("id", "tag")
    },

    Q(
      "cond_case",
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'debt'
        |       WHEN c_acctbal < 5000 THEN 'low'
        |       ELSE 'high' END AS bal_class,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        |  GREATEST(c_acctbal, 0.0) AS bal_pos,
        |  LEAST(CAST(c_nationkey AS BIGINT), 10) AS nk_cap
        |FROM customer""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "debt")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("bal_class"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
          .as("seg"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_pos"),
        least(col("c_nationkey").cast("long"), lit(10L)).as("nk_cap"))
    },

    // Cast matrix (reference: crates/sqllib/src/casts.rs, 255 fns;
    // SURVEY §2.8). double→int uses explicit floor: Spark ANSI cast
    // truncates while DuckDB rounds, so the bare cast is not portable.
    Q(
      "cast_matrix",
      """SELECT c_custkey,
        |  CAST(c_custkey AS VARCHAR) AS key_str,
        |  CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
        |  CAST(c_nationkey AS DOUBLE) AS nk_d,
        |  CAST(c_nationkey AS SMALLINT) AS nk_s,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS bal_dec_str,
        |  CAST(c_acctbal > 0 AS INTEGER) AS is_pos
        |FROM customer""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        col("c_custkey").cast("string").as("key_str"),
        floor(col("c_acctbal")).cast("long").as("bal_floor"),
        col("c_nationkey").cast("double").as("nk_d"),
        col("c_nationkey").cast("short").as("nk_s"),
        col("c_acctbal").cast(DecimalType(18, 2)).cast("string")
          .as("bal_dec_str"),
        (col("c_acctbal") > 0).cast("int").as("is_pos"))
    }
  )
}
