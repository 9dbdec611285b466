package graft.runtime

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ddl.Ddl
import graft.zset.ZSets

/** Program runner (SURVEY §3.1/§7.1 runtime/): tables + views → executed
  * pipeline. Mirrors the reference's controller step loop
  * (crates/adapters/src/controller.rs:481 — ingest deltas, evaluate once,
  * emit output deltas) as Spark micro-batches.
  *
  * Modes:
  *  - `runBatch`: evaluate every view over current table snapshots
  *    (DataFusion-ad-hoc analogue; ad-hoc.md:1-23). Views see each other
  *    (topological registration), so nested views share Catalyst-optimized
  *    subplans — the CSE the reference gets from its circuit
  *    (CircuitOptimizer CSE pass :102,156).
  *  - `step`: consume Z-set deltas per table, maintain a materialized
  *    snapshot per table, re-evaluate views, and emit per-view output
  *    deltas (new vs old Z-set difference). The final-state-equals-batch
  *    contract (README.md:67-70) holds by construction and is asserted in
  *    PipelineSpec.
  *
  * Scale: snapshots would live as bucketed Delta/parquet tables rather
  * than cached DataFrames; the view-diff becomes MERGE on the bucket key.
  * LATENESS columns (Ddl.ColumnDef.lateness) map to withWatermark in the
  * streaming path (graft.streaming.Streams.withLateness).
  */
final class Pipeline(spark: SparkSession, program: Ddl.Program) {

  graft.functions.Registry.registerAll(spark)

  private val snapshots = mutable.Map[String, DataFrame]()
  private val lastViewState = mutable.Map[String, DataFrame]()

  /** Current materialized snapshot of a table (empty before first delta). */
  def snapshot(table: String): Option[DataFrame] = snapshots.get(table)

  /** Register table snapshots as temp views, then evaluate each view in
    * declaration order (later views may reference earlier ones).
    */
  def runBatch(inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    inputs.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    program.views.map { v =>
      val df = spark.sql(v.sql)
      df.createOrReplaceTempView(v.name)
      v.name -> df
    }.toMap
  }

  /** One incremental step: apply Z-set deltas (must carry `_w`) to table
    * snapshots, re-evaluate views over the new snapshots, and return
    * per-view OUTPUT DELTAS (Z-sets). Upsert tables (PRIMARY KEY) should
    * pre-convert via graft.streaming.Upsert.
    */
  def step(deltas: Map[String, DataFrame]): Map[String, DataFrame] = {
    deltas.foreach { case (name, d) =>
      val merged = snapshots.get(name) match {
        case Some(prev) => ZSets.consolidate(prev.unionByName(d))
        case None => ZSets.consolidate(d)
      }
      val mat = materialize(merged)
      snapshots(name) = mat
    }
    // plain relations for view evaluation
    snapshots.foreach { case (n, z) =>
      ZSets.toMultiset(z).createOrReplaceTempView(n)
    }
    program.views.map { v =>
      val now = materialize(spark.sql(v.sql))
      now.createOrReplaceTempView(v.name)
      val delta = lastViewState.get(v.name) match {
        case Some(prev) =>
          ZSets.consolidate(
            ZSets.lift(now).unionByName(ZSets.negate(ZSets.lift(prev))))
        case None => ZSets.lift(now)
      }
      lastViewState(v.name) = now
      v.name -> delta
    }.toMap
  }

  /** Ad-hoc SQL over materialized views/tables (entry point B, §3.2). */
  def adHoc(sql: String): DataFrame = spark.sql(sql)

  private def materialize(df: DataFrame): DataFrame = {
    val rdd = df.rdd
    rdd.cache()
    spark.createDataFrame(rdd, df.schema)
  }
}

object Pipeline {
  def apply(spark: SparkSession, programSql: String): Pipeline =
    new Pipeline(spark, Ddl.parse(programSql))
}
