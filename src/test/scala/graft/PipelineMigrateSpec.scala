package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.runtime.Pipeline
import graft.zset.ZSets

/** Bootstrapping (pipelines/modifying.md): modify a pipeline's SQL while
  * preserving its state — table history carries over (no re-ingest), every
  * view of the new program is rebuilt from that history, and the returned
  * bootstrap deltas are exactly what sinks need: full content for new
  * views, a diff for modified/affected ones, nothing for stable ones.
  * The migrated pipeline must keep stepping incrementally afterwards.
  */
class PipelineMigrateSpec extends SparkSpec {

  private val v1 =
    """CREATE TABLE ev (k BIGINT NOT NULL, grp BIGINT, v DOUBLE);
      |CREATE TABLE dim (grp BIGINT NOT NULL, name VARCHAR);
      |CREATE VIEW agg AS
      |  SELECT grp, COUNT(*) AS n, SUM(v) AS sv FROM ev GROUP BY grp;
      |CREATE VIEW joined AS
      |  SELECT e.k, d.name, e.v FROM ev e JOIN dim d ON e.grp = d.grp;"""
      .stripMargin

  // joined's SQL changes (filter added); agg is untouched; named is NEW
  private val v2 =
    """CREATE TABLE ev (k BIGINT NOT NULL, grp BIGINT, v DOUBLE);
      |CREATE TABLE dim (grp BIGINT NOT NULL, name VARCHAR);
      |CREATE VIEW agg AS
      |  SELECT grp, COUNT(*) AS n, SUM(v) AS sv FROM ev GROUP BY grp;
      |CREATE VIEW joined AS
      |  SELECT e.k, d.name, e.v FROM ev e JOIN dim d ON e.grp = d.grp
      |  WHERE e.v >= 10;
      |CREATE VIEW named AS SELECT DISTINCT name FROM dim;""".stripMargin

  private def ev(lo: Int, hi: Int): DataFrame =
    spark.range(lo.toLong, hi.toLong).select(col("id").as("k"),
      (col("id") % 4).as("grp"), (col("id") % 25).cast("double").as("v"))
      .withColumn(ZSets.W, lit(1L))

  private def dims: DataFrame = spark.range(4L)
    .select(col("id").as("grp"), concat(lit("g"), col("id")).as("name"))
    .withColumn(ZSets.W, lit(1L))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("migrate preserves table state, rebuilds views, emits right deltas") {
    val p1 = Pipeline(spark, v1)
    p1.step(Map("ev" -> ev(0, 60), "dim" -> dims))
    p1.step(Map("ev" -> ev(60, 100)))
    val oldJoined = p1.adHoc("SELECT * FROM joined").localCheckpoint(true)

    val (p2, deltas) = p1.migrate(v2)
    // stable view: no bootstrap delta; modified + new views have one
    assert(deltas.keySet === Set("joined", "named"))

    // all views equal a batch recompute over the preserved history
    ev(0, 100).drop(ZSets.W).createOrReplaceTempView("ev_all")
    dims.drop(ZSets.W).createOrReplaceTempView("dim_all")
    assert(rows(p2.adHoc("SELECT * FROM agg")) === rows(spark.sql(
      "SELECT grp, COUNT(*) AS n, SUM(v) AS sv FROM ev_all GROUP BY grp")))
    val wantJoined = spark.sql(
      """SELECT e.k, d.name, e.v FROM ev_all e JOIN dim_all d
        |ON e.grp = d.grp WHERE e.v >= 10""".stripMargin)
    assert(rows(p2.adHoc("SELECT * FROM joined")) === rows(wantJoined))

    // the modified view's delta, applied to the OLD sink content,
    // reproduces the new content (the sink-backfill contract)
    val applied = ZSets.toMultiset(ZSets.consolidate(
      ZSets.lift(oldJoined).unionByName(deltas("joined"))))
    assert(rows(applied) === rows(wantJoined))
    // the new view's delta IS its full content
    assert(rows(ZSets.toMultiset(ZSets.consolidate(deltas("named"))))
      === rows(spark.sql("SELECT DISTINCT name FROM dim_all")))

    // and the migrated pipeline keeps maintaining incrementally
    p2.step(Map("ev" -> ev(100, 120)))
    ev(0, 120).drop(ZSets.W).createOrReplaceTempView("ev_all2")
    assert(rows(p2.adHoc("SELECT * FROM agg")) === rows(spark.sql(
      "SELECT grp, COUNT(*) AS n, SUM(v) AS sv FROM ev_all2 GROUP BY grp")))
  }

  test("a table whose schema changed drops its state (re-ingest contract)") {
    val p1 = Pipeline(spark, v1)
    p1.step(Map("ev" -> ev(0, 30), "dim" -> dims))
    val changed = v1.replace("v DOUBLE", "v BIGINT")
    val (p2, _) = p1.migrate(changed)
    assert(p2.adHoc("SELECT COUNT(*) AS n FROM ev").collect()
      .head.getLong(0) === 0L, "changed-schema table must restart empty")
    // the unchanged dim carried over
    assert(p2.adHoc("SELECT COUNT(*) AS n FROM dim").collect()
      .head.getLong(0) === 4L)
  }

  test("LATENESS waterline reconstructs through the seed step") {
    // the carried rows contain the max observed ts, so replaying them
    // re-derives the old waterline: a row the pre-migration pipeline
    // would discard as late stays discarded post-migration
    val prog =
      """CREATE TABLE ev (k BIGINT NOT NULL,
        |  ts TIMESTAMP LATENESS INTERVAL 1 HOUR);
        |CREATE VIEW cnt AS SELECT COUNT(*) AS n FROM ev;""".stripMargin
    import spark.implicits._
    def batch(rows: (Long, String)*): DataFrame =
      rows.toSeq.toDF("k", "s")
        .select(col("k"), col("s").cast("timestamp").as("ts"))
        .withColumn(ZSets.W, lit(1L))
    val p1 = Pipeline(spark, prog)
    p1.step(Map("ev" -> batch(
      (1L, "2026-01-01 10:00:00"), (2L, "2026-01-01 12:00:00"))))
    val (p2, _) = p1.migrate(prog)
    // 10:00 is below the reconstructed waterline (12:00 - 1h) → discarded
    p2.step(Map("ev" -> batch((3L, "2026-01-01 10:30:00"),
      (4L, "2026-01-01 12:30:00"))))
    assert(p2.adHoc("SELECT * FROM cnt").collect().head.getLong(0) === 3L)
    assert(p2.adHoc("SELECT COUNT(*) AS e FROM error_view")
      .collect().head.getLong(0) === 1L)
  }

  test("recursive programs migrate: closure continues incrementally") {
    val prog =
      """CREATE TABLE edges (src BIGINT, dst BIGINT);
        |DECLARE RECURSIVE VIEW closure (src BIGINT, dst BIGINT);
        |CREATE VIEW closure AS
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT c.src, e.dst FROM closure c JOIN edges e ON c.dst = e.src;"""
        .stripMargin
    import spark.implicits._
    def edges(rows: (Long, Long)*): DataFrame =
      rows.toSeq.toDF("src", "dst").withColumn(ZSets.W, lit(1L))
    val p1 = Pipeline(spark, prog)
    p1.step(Map("edges" -> edges((1L, 2L), (2L, 3L))))
    val (p2, deltas) = p1.migrate(prog)
    // identical program: closure is recursive → always rebuilt, and its
    // bootstrap diff must be EMPTY (content unchanged)
    deltas.get("closure").foreach { d =>
      assert(ZSets.consolidate(d).filter(col(ZSets.W) =!= 0).count() === 0L)
    }
    p2.step(Map("edges" -> edges((3L, 4L))))
    val got = p2.adHoc("SELECT * FROM closure")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)))
  }

  test("PRIMARY KEY presence state survives migration") {
    val prog =
      """CREATE TABLE kv (k BIGINT NOT NULL, v BIGINT, PRIMARY KEY (k));
        |CREATE VIEW cur AS SELECT k, v FROM kv;""".stripMargin
    val progPlus = prog + "\nCREATE VIEW big AS SELECT k FROM kv WHERE v > 15;"
    import spark.implicits._
    def cmds(rows: (Long, Long, Boolean)*): DataFrame =
      rows.toSeq.toDF("k", "v", "_deleted")
    val p1 = Pipeline(spark, prog)
    p1.step(Map("kv" -> cmds((1L, 10L, false), (2L, 20L, false))))
    val (p2, _) = p1.migrate(progPlus)
    // overwrite k=1 post-migration: presence state must retract v=10
    p2.step(Map("kv" -> cmds((1L, 11L, false), (2L, 0L, true))))
    val got = p2.adHoc("SELECT * FROM cur")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === Seq((1L, 11L)))
  }
}
