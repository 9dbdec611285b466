package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.zset.ZSets

/** JSON update-envelope decode: raw JSON lines → Z-set delta rows
  * (`schema` data columns + `_w`).
  *
  * Formats mirror the reference's wire contract
  * (crates/feldera-types/src/format/json.rs:148-160; docs formats/json):
  *
  *  - `insert_delete`: `{"insert": {...}}` → +1, `{"delete": {...}}` → −1
  *  - `weighted`:      `{"weight": n, "data": {...}}` → weight n
  *  - `raw`:           bare record → +1 (insert-only streams)
  *  - `snowflake`:     flat record + `__action` ("insert"/"delete")
  *  - `debezium`:      `{"payload": {"op": c|r|u|d, "before": …, "after": …}}`
  *                     — `u` emits a retraction of `before` AND an insert
  *                     of `after`
  *
  * Everything is pure column expressions (from_json + explode) — the
  * decode runs inside whole-stage codegen and scales with the scan; no
  * UDFs, no driver work. Malformed lines yield null parses and are
  * dropped, matching the reference's skip-on-error connector default.
  */
object Envelopes {

  /** Decode `raw`'s string column `valueCol` in the given update format. */
  def decodeJson(raw: DataFrame, schema: StructType,
      format: String, valueCol: String = "value"): DataFrame = {
    val v = col(valueCol)
    def finish(entries: Column): DataFrame =
      raw.select(explode(entries).as("_e"))
        .where(col("_e.r").isNotNull)
        .select(schema.fieldNames.map(f => col(s"_e.r.`$f`"))
          :+ col("_e.w").as(ZSets.W): _*)

    format.toLowerCase match {
      case "insert_delete" =>
        val env = StructType(Seq(
          StructField("insert", schema), StructField("delete", schema)))
        val p = from_json(v, env)
        finish(array(
          struct(p.getField("insert").as("r"), lit(1L).as("w")),
          struct(p.getField("delete").as("r"), lit(-1L).as("w"))))
      case "weighted" =>
        val env = StructType(Seq(
          StructField("weight", LongType), StructField("data", schema)))
        val p = from_json(v, env)
        finish(array(struct(p.getField("data").as("r"),
          coalesce(p.getField("weight"), lit(1L)).as("w"))))
      case "raw" =>
        val p = from_json(v, schema)
        finish(array(struct(p.as("r"), lit(1L).as("w"))))
      case "snowflake" =>
        val env = StructType(schema.fields.toSeq
          :+ StructField("__action", StringType))
        val p = from_json(v, env)
        val row = struct(schema.fieldNames.map(f =>
          p.getField(f).as(f)): _*)
        finish(array(struct(row.as("r"),
          when(p.getField("__action") === "delete", -1L)
            .otherwise(1L).as("w"))))
      case "debezium" =>
        val env = StructType(Seq(StructField("payload", StructType(Seq(
          StructField("op", StringType),
          StructField("before", schema), StructField("after", schema))))))
        val p = from_json(v, env).getField("payload")
        val op = p.getField("op")
        finish(array(
          struct(when(op.isin("d", "u"), p.getField("before")).as("r"),
            lit(-1L).as("w")),
          struct(when(op.isin("c", "r", "u"), p.getField("after")).as("r"),
            lit(1L).as("w"))))
      case other =>
        throw new IllegalArgumentException(s"unknown update format: $other")
    }
  }

  /** CSV record decode (reference: crates/adapters/src/format/csv.rs —
    * input rows are INSERTS; delimiter/quote/escape/headers mirror
    * CsvFormatConfig in crates/feldera-types/src/format/csv.rs:22-56).
    * Malformed lines drop, like the JSON path: a corrupt-record sidecar
    * column marks rows the parser could not fully decode.
    */
  def decodeCsv(raw: DataFrame, schema: StructType,
      delimiter: String = ",", quote: String = "\"",
      escape: Option[String] = None, headers: Boolean = false,
      valueCol: String = "value"): DataFrame = {
    val parseSchema = StructType(schema.fields.toSeq
      :+ StructField("_corrupt", StringType))
    val opts = Map(
      "sep" -> delimiter, "quote" -> quote,
      "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt") ++
      escape.map("escape" -> _)
    val headerLine = schema.fieldNames.mkString(delimiter)
    val rows = if (headers) raw.filter(col(valueCol) =!= headerLine) else raw
    rows.select(from_csv(col(valueCol), parseSchema, opts).as("_r"))
      .where(col("_r._corrupt").isNull)
      .select(schema.fieldNames.map(f => col(s"_r.`$f`"))
        :+ lit(1L).as(ZSets.W): _*)
  }

  /** JSON update-envelope ENCODE: Z-set delta rows (data columns + `_w`)
    * → one envelope string per output line in column `value` — the egress
    * mirror of [[decodeJson]] (reference: JSON output formats in
    * crates/adapters/src/format/json/output.rs; docs formats/json).
    *
    * `insert_delete`/`snowflake` carry unit weights on the wire, so a row
    * with |_w| > 1 expands to |_w| lines (array_repeat + explode — still
    * pure codegen'd expressions); `weighted` keeps the weight in-band and
    * emits one line per row. Field order in the JSON object follows the
    * input column order, deterministically.
    */
  /** Formats [[encodeJson]] can emit; sinks use this to gate envelope
    * encoding (raw/debezium are decode-only here).
    */
  val encodableFormats: Set[String] = Set("insert_delete", "weighted",
    "snowflake")

  def encodeJson(delta: DataFrame, format: String,
      valueCol: String = "value"): DataFrame = {
    val dataCols = delta.columns.filterNot(_ == ZSets.W).toSeq
    val rec = to_json(struct(dataCols.map(col): _*))
    val w = col(ZSets.W)
    // unit-weight formats expand a weight-w row to |w| wire lines via
    // array_repeat(_, |w| as int): guard the int cast so a |w| beyond
    // Int.MaxValue fails loudly instead of wrapping negative and silently
    // emitting zero lines
    val wInt = when(abs(w) > Int.MaxValue.toLong,
      raise_error(concat(lit("encodeJson: |_w| exceeds Int.MaxValue: "),
        w.cast("string")))).otherwise(abs(w).cast("int"))
    format.toLowerCase match {
      case "insert_delete" =>
        val line = concat(
          when(w > 0, lit("{\"insert\":")).otherwise(lit("{\"delete\":")),
          rec, lit("}"))
        delta.where(w =!= 0)
          .select(explode(array_repeat(line, wInt)).as(valueCol))
      case "weighted" =>
        delta.where(w =!= 0)
          .select(concat(lit("{\"weight\":"), w.cast("string"),
            lit(",\"data\":"), rec, lit("}")).as(valueCol))
      case "snowflake" =>
        val flat = to_json(struct(dataCols.map(col) :+
          when(w > 0, lit("insert")).otherwise(lit("delete"))
            .as("__action"): _*))
        delta.where(w =!= 0)
          .select(explode(array_repeat(flat, wInt)).as(valueCol))
      case other =>
        throw new IllegalArgumentException(
          s"unknown output update format: $other")
    }
  }

  /** Format dispatch used by the transports: JSON update envelopes, CSV
    * records, and a precise jar-gate for Avro (spark-avro is an external
    * module; these jars ship without it).
    */
  def decode(raw: DataFrame, schema: StructType, format: String,
      valueCol: String = "value"): DataFrame = format.toLowerCase match {
    case "csv" => decodeCsv(raw, schema, valueCol = valueCol)
    case "avro" => throw new IllegalStateException(
      "avro format requires the spark-avro module on the classpath " +
        "(org.apache.spark:spark-avro); not bundled in this build")
    case json => decodeJson(raw, schema, json, valueCol)
  }
}
