package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

import graft.ddl.Ddl
import graft.streaming.Streams
import graft.types.SqlTypes

/** File-stream transport (reference: crates/adapters/src/transport/file.rs
  * + the kafka transport's role; SURVEY §2.1). A table ingests JSON-lines
  * files dropped under `dir/<table>/`, decoded by [[Envelopes]]; Spark's
  * file source tracks processed files in the query checkpoint, giving
  * replayable, exactly-once-per-file semantics — the property the
  * reference gets from its input-endpoint journal.
  */
object FileSource {

  /** Spark schema of a DDL table. */
  def schemaOf(t: Ddl.TableDef): StructType =
    StructType(t.columns.map(c => StructField(
      c.name, SqlTypes.toSpark(c.sqlType), nullable = !c.notNull)))

  /** Streaming Z-set delta source for one table: text files under
    * `dir/<table>/`, decoded per `format`. LATENESS declarations become a
    * watermark on the declared column (streaming.md:12-18 ↔
    * withWatermark), so downstream windowed aggregations inherit
    * emit_final/GC semantics directly.
    */
  def tableStream(spark: SparkSession, dir: String, table: Ddl.TableDef,
      format: String = "insert_delete"): DataFrame = {
    val raw = spark.readStream.text(s"$dir/${table.name}")
    val decoded = Envelopes.decode(raw, schemaOf(table), format)
    table.columns.find(_.lateness.isDefined) match {
      case Some(c) =>
        // Feldera TIMESTAMP is wall-clock (NTZ); Spark watermarks require
        // TIMESTAMP. Session TZ is fixed UTC, so the cast is value-preserving.
        val ts = decoded.withColumn(c.name,
          col(c.name).cast(org.apache.spark.sql.types.TimestampType))
        Streams.withLateness(ts, c.name,
          c.lateness.get.replaceFirst("(?i)^INTERVAL\\s+", ""))
      case None => decoded
    }
  }

  /** One combined stream for ALL program tables (tagged by `_table`), so a
    * single foreachBatch step sees every table's delta atomically — the
    * reference's one-circuit-step-per-batch contract
    * (crates/adapters/src/controller.rs:481).
    */
  def programStream(spark: SparkSession, dir: String,
      program: Ddl.Program): DataFrame =
    spark.readStream.text(
        s"$dir/{${program.tables.map(_.name).mkString(",")}}")
      .select(col("value"), input_file_name().as("_file"))
      .withColumn("_table",
        regexp_extract(col("_file"), ".*/([^/]+)/[^/]+$", 1))
      .drop("_file")
}
