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

  /** Decode `raw`'s string column `valueCol` in the given update format.
    *
    * `defaults` maps column name → SQL DEFAULT expression
    * (grammar.md:135-151): a field the record does NOT carry decodes to
    * the default instead of NULL. Presence is tested on the record's own
    * json object (json_object_keys), so an EXPLICIT null stays null —
    * the serde contract real DEFAULT columns follow. Callers resolve
    * CONNECTOR_METADATA() before passing (Connectors.substMetadata).
    */
  def decodeJson(raw: DataFrame, schema: StructType,
      format: String, valueCol: String = "value",
      defaults: Map[String, String] = Map.empty): DataFrame = {
    val v = col(valueCol)
    def finish(entries: Column): DataFrame = {
      val base = raw.select(explode(entries).as("_e"))
        .where(col("_e.r").isNotNull)
      val cols = schema.fields.map { f =>
        val c = col(s"_e.r.`${f.name}`")
        defaults.get(f.name) match {
          case Some(d) =>
            when(c.isNull && !array_contains(
                json_object_keys(col("_e.j")), f.name),
              expr(d).cast(f.dataType)).otherwise(c).as(f.name)
          case None => c
        }
      }
      base.select(cols.toSeq :+ col("_e.w").as(ZSets.W): _*)
    }
    // the raw-object json (`j`) is only materialized when DEFAULT columns
    // need the presence test — the defaults-free hot path keeps the exact
    // two-field entry it always had (no per-row get_json_object)
    def entry(r: Column, w: Column, j: => Column): Column =
      if (defaults.isEmpty) struct(r.as("r"), w.as("w"))
      else struct(r.as("r"), w.as("w"), j.as("j"))

    format.toLowerCase match {
      case "insert_delete" =>
        val env = StructType(Seq(
          StructField("insert", schema), StructField("delete", schema)))
        val p = from_json(v, env)
        finish(array(
          entry(p.getField("insert"), lit(1L),
            get_json_object(v, "$.insert")),
          entry(p.getField("delete"), lit(-1L),
            get_json_object(v, "$.delete"))))
      case "weighted" =>
        val env = StructType(Seq(
          StructField("weight", LongType), StructField("data", schema)))
        val p = from_json(v, env)
        finish(array(entry(p.getField("data"),
          coalesce(p.getField("weight"), lit(1L)),
          get_json_object(v, "$.data"))))
      case "raw" =>
        val p = from_json(v, schema)
        finish(array(entry(p, lit(1L), v)))
      case "snowflake" =>
        val env = StructType(schema.fields.toSeq
          :+ StructField("__action", StringType))
        val p = from_json(v, env)
        val row = struct(schema.fieldNames.map(f =>
          p.getField(f).as(f)): _*)
        finish(array(entry(row,
          when(p.getField("__action") === "delete", -1L)
            .otherwise(1L), v)))
      case "debezium" =>
        val env = StructType(Seq(StructField("payload", StructType(Seq(
          StructField("op", StringType),
          StructField("before", schema), StructField("after", schema))))))
        val p = from_json(v, env).getField("payload")
        val op = p.getField("op")
        finish(array(
          entry(when(op.isin("d", "u"), p.getField("before")), lit(-1L),
            get_json_object(v, "$.payload.before")),
          entry(when(op.isin("c", "r", "u"), p.getField("after")), lit(1L),
            get_json_object(v, "$.payload.after"))))
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

  /** Index-merged upsert form of a view output delta
    * (connectors/unique_keys.md): group the delta by the declared unique
    * key and merge each key's delete+insert PAIR into one atomic
    * `update`. Returns (`_op` ∈ insert/update/delete, data columns) —
    * insert/update rows carry the NEW payload, delete rows the OLD. The
    * index's uniqueness contract (one live row per key, unit weights) is
    * ENFORCED: a key with more than one inserted or retracted row in the
    * delta raises, rather than silently emitting ambiguous updates.
    *
    * 100-TB shape: one hash aggregation on the key — the same shuffle the
    * consolidation already pays — with the pair-merge as a scan-side
    * conditional; no self-join, no window.
    */
  def upsertForm(delta: DataFrame, keys: Seq[String],
      opCol: String = "_op"): DataFrame = {
    val con = ZSets.consolidate(delta).filter(col(ZSets.W) =!= 0)
    val payload = con.columns.filterNot(c =>
      keys.contains(c) || c == ZSets.W).toSeq
    require(payload.nonEmpty,
      s"upsertForm: view has no non-key columns besides ${keys.mkString(",")}")
    // collect_list skips nulls: each side keeps only its sign's rows
    def side(cond: Column): Column =
      collect_list(when(cond, struct(payload.map(col): _*)))
    val grouped = con.groupBy(keys.map(col): _*)
      .agg(side(col(ZSets.W) > 0).as("_new"),
        side(col(ZSets.W) < 0).as("_old"),
        max(abs(col(ZSets.W))).as("_maxw"))
    val guard = when(size(col("_new")) > 1 || size(col("_old")) > 1
        || col("_maxw") > 1,
      raise_error(concat(lit("upsertForm: index key is not unique in "
        + "delta: "), to_json(struct(keys.map(col): _*)))))
    val op = when(size(col("_new")) === 1 && size(col("_old")) === 1,
        lit("update"))
      .when(size(col("_new")) === 1, lit("insert"))
      .otherwise(lit("delete"))
    val row = when(size(col("_new")) === 1, col("_new").getItem(0))
      .otherwise(col("_old").getItem(0))
    grouped
      .select((keys.map(col) :+ coalesce(guard.cast("string"), op)
        .as(opCol) :+ row.as("_r")): _*)
      .select((Seq(col(opCol)) ++ keys.map(col)
        ++ payload.map(f => col(s"_r.`$f`").as(f))): _*)
  }

  /** [[upsertForm]] rendered as JSON wire lines:
    * `{"insert": {...new}}`, `{"update": {...new}}`, `{"delete":
    * {...old}}` — the atomic-update egress envelope an indexed output
    * connector emits instead of separate delete+insert lines.
    */
  def encodeJsonUpserts(delta: DataFrame, keys: Seq[String],
      valueCol: String = "value"): DataFrame = {
    val up = upsertForm(delta, keys)
    val dataCols = up.columns.filterNot(_ == "_op").toSeq
    up.select(concat(lit("{\""), col("_op"), lit("\":"),
      to_json(struct(dataCols.map(col): _*)), lit("}")).as(valueCol))
  }

  /** Binary Avro record decode (the reference's avro input format,
    * crates/adapters/src/format/avro/): a BINARY `valueCol` of
    * Avro-encoded records → insert rows matching `schema`, using the
    * bundled Avro core library directly (spark-avro, the DATASOURCE
    * module, is not on this classpath — record decode doesn't need it).
    * Runs as per-partition imperative decode (`mapPartitions` analogue) —
    * one reader per partition, decoder reuse per record; this is the
    * legitimate per-partition escape hatch, not a per-row UDF.
    *
    * `confluentWire = true` skips the 5-byte schema-registry framing
    * (magic byte + schema id) the reference's Kafka+Avro path carries
    * (avro/schema_registry_settings in the connector docs); resolution
    * against a live registry is out of scope — the writer schema is
    * passed explicitly.
    *
    * Field mapping is BY NAME over primitive/nullable-union Avro types
    * (long/int/double/float/boolean/string/bytes); a missing field or an
    * unmapped type fails fast with the field name.
    */
  def decodeAvro(raw: DataFrame, schema: StructType,
      avroSchemaJson: String, valueCol: String = "value",
      confluentWire: Boolean = false): DataFrame = {
    val spark = raw.sparkSession
    val fields = schema.fields.map(f => (f.name, f.dataType))
    val bytesRdd = raw.select(col(valueCol)).rdd
      .map(_.getAs[Array[Byte]](0))
    val rows = bytesRdd.mapPartitions { it =>
      val avSchema = new org.apache.avro.Schema.Parser()
        .parse(avroSchemaJson)
      val reader = new org.apache.avro.generic
        .GenericDatumReader[org.apache.avro.generic.GenericRecord](avSchema)
      var decoder: org.apache.avro.io.BinaryDecoder = null
      it.map { bytes =>
        val payload =
          if (confluentWire) java.util.Arrays.copyOfRange(bytes, 5, bytes.length)
          else bytes
        decoder = org.apache.avro.io.DecoderFactory.get()
          .binaryDecoder(payload, decoder)
        val rec = reader.read(null, decoder)
        avroRow(rec, fields)
      }
    }
    spark.createDataFrame(rows, schema).withColumn(ZSets.W, lit(1L))
  }

  /** Confluent-framed Avro decode with schema-REGISTRY resolution (the
    * reference's `registry_urls` avro connector setting): each record's
    * 5-byte header carries the writer-schema id; the writer schema is
    * fetched from the registry and cached per JVM
    * ([[SchemaRegistry.schemaForId]]), so a backlog with rotating schema
    * versions decodes with one registry round trip per distinct id per
    * executor. Field mapping is BY NAME (as [[decodeAvro]]), which is the
    * useful half of Avro schema evolution for ingestion: renamed ids keep
    * decoding as long as the declared columns exist in the writer schema.
    */
  def decodeAvroRegistry(raw: DataFrame, schema: StructType,
      registryUrls: String, valueCol: String = "value"): DataFrame = {
    val spark = raw.sparkSession
    val fields = schema.fields.map(f => (f.name, f.dataType))
    val bytesRdd = raw.select(col(valueCol)).rdd
      .map(_.getAs[Array[Byte]](0))
    val rows = bytesRdd.mapPartitions { it =>
      // per-partition reader cache on top of the per-JVM schema cache:
      // parse each distinct writer schema once per task
      val readers = scala.collection.mutable.Map.empty[Int,
        org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]]
      var decoder: org.apache.avro.io.BinaryDecoder = null
      it.map { bytes =>
        val id = SchemaRegistry.schemaIdOf(bytes)
        val reader = readers.getOrElseUpdate(id, {
          val json = SchemaRegistry.schemaForId(registryUrls, id)
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord](
            new org.apache.avro.Schema.Parser().parse(json))
        })
        val payload = java.util.Arrays.copyOfRange(
          bytes, SchemaRegistry.WireHeaderLen, bytes.length)
        decoder = org.apache.avro.io.DecoderFactory.get()
          .binaryDecoder(payload, decoder)
        val rec = reader.read(null, decoder)
        avroRowLenient(rec, fields)
      }
    }
    spark.createDataFrame(rows, schema).withColumn(ZSets.W, lit(1L))
  }

  /** Egress twin of [[decodeAvro]] (the reference's avro OUTPUT format,
    * crates/adapters/src/format/avro/output.rs): each multiset row →
    * one binary Avro record in `valueCol`, per-partition encoder reuse.
    * A weight-w row emits |w| records. Field mapping mirrors the decode.
    *
    * `cdcField` (formats/avro.md `cdc_field`, raw update format only —
    * the contract the Iceberg Sink Kafka Connector consumes,
    * connectors/sinks/iceberg.md): when set, a string field of that name
    * is ADDED to the writer schema and carries the operation — `I` for
    * inserts (w > 0), `D` for deletions (w < 0). Without it, negative
    * weights are rejected: plain avro egress is an insert stream.
    *
    * `registryUrls` (the reference encoder's `post_schema` step): the
    * EFFECTIVE writer schema (incl. the cdc_field extension) is
    * registered once driver-side under `subject` — default subject is
    * the record's full name, the record-name strategy the reference
    * defaults to for raw avro — and every outgoing record is framed
    * with the Confluent 5-byte header carrying the returned id, so
    * [[decodeAvro]]/[[decodeAvroRegistry]] consumers resolve it back.
    */
  def encodeAvro(delta: DataFrame, avroSchemaJson: String,
      valueCol: String = "value",
      cdcField: Option[String] = None,
      registryUrls: Option[String] = None,
      subject: Option[String] = None): DataFrame = {
    val spark = delta.sparkSession
    val fields = delta.schema.fields.filterNot(_.name == ZSets.W)
      .map(f => (f.name, f.dataType))
    val hasW = delta.columns.contains(ZSets.W)
    // cdc_field extends the user schema: original fields + the op column
    def extend(base: org.apache.avro.Schema): org.apache.avro.Schema =
      cdcField match {
        case None => base
        case Some(cf) =>
          val fs = new java.util.ArrayList[org.apache.avro.Schema.Field]()
          base.getFields.forEach(f => fs.add(
            new org.apache.avro.Schema.Field(f.name(), f.schema(),
              f.doc(), f.defaultVal())))
          fs.add(new org.apache.avro.Schema.Field(cf,
            org.apache.avro.Schema.create(
              org.apache.avro.Schema.Type.STRING), null, null))
          org.apache.avro.Schema.createRecord(base.getName, base.getDoc,
            base.getNamespace, false, fs)
      }
    val driverSchema = extend(
      new org.apache.avro.Schema.Parser().parse(avroSchemaJson))
    // registry registration happens ONCE, driver-side, before the job;
    // executors only prepend the already-known id
    val header: Array[Byte] = registryUrls match {
      case None => Array.emptyByteArray
      case Some(urls) =>
        val subj = subject.getOrElse(driverSchema.getFullName)
        val id = SchemaRegistry.registerSchema(urls, subj,
          driverSchema.toString)
        Array[Byte](0, (id >> 24).toByte, (id >> 16).toByte,
          (id >> 8).toByte, id.toByte)
    }
    val effectiveJson = driverSchema.toString
    val rows = delta.rdd.mapPartitions { it =>
      val avSchema = new org.apache.avro.Schema.Parser()
        .parse(effectiveJson)
      val writer = new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](avSchema)
      val bos = new java.io.ByteArrayOutputStream()
      var encoder: org.apache.avro.io.BinaryEncoder = null
      it.flatMap { row =>
        val w = if (hasW) row.getAs[Long](ZSets.W) else 1L
        require(w >= 0 || cdcField.isDefined,
          s"encodeAvro: negative weight $w — plain avro egress is " +
            "insert-only (set cdc_field to emit I/D operations)")
        val rec = new org.apache.avro.generic.GenericData.Record(avSchema)
        fields.foreach { case (name, dt) =>
          val v = row.getAs[Any](name)
          rec.put(name, (v, dt) match {
            case (null, _) => null
            case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
            case (x, _) => x
          })
        }
        cdcField.foreach(cf => rec.put(cf, if (w < 0) "D" else "I"))
        bos.reset()
        encoder = org.apache.avro.io.EncoderFactory.get()
          .binaryEncoder(bos, encoder)
        writer.write(rec, encoder)
        encoder.flush()
        val bytes =
          if (header.isEmpty) bos.toByteArray else header ++ bos.toByteArray
        Seq.fill(math.abs(w).toInt)(org.apache.spark.sql.Row(bytes))
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField(valueCol, BinaryType))))
  }

  /** The Confluent JDBC sink envelope
    * (connectors/sinks/confluent-jdbc.md): keyed Kafka Avro messages —
    * key = Avro record of the `keys` columns, value = Avro record of
    * the full row for insert/update, NULL (a tombstone) for delete.
    * Key and value writer schemas register under the topic-name-strategy
    * subjects `<topic>-key` / `<topic>-value` and every component is
    * framed with the Confluent 5-byte header.
    *
    * Returns (key BINARY, value BINARY-nullable) rows, ready for
    * [[Kafka.writeRoundKeyed]].
    */
  def encodeAvroConfluentJdbc(delta: DataFrame, keys: Seq[String],
      avroSchemaJson: String, registryUrls: String,
      topic: String): DataFrame = {
    val spark = delta.sparkSession
    val valueSchema =
      new org.apache.avro.Schema.Parser().parse(avroSchemaJson)
    // key schema: the key columns' fields, subset of the value schema
    val keySchema = {
      val fs = new java.util.ArrayList[org.apache.avro.Schema.Field]()
      keys.foreach { k =>
        val f = Option(valueSchema.getField(k)).getOrElse(sys.error(
          s"confluent_jdbc: key field $k missing from avro_schema"))
        fs.add(new org.apache.avro.Schema.Field(f.name(), f.schema(),
          f.doc(), f.defaultVal()))
      }
      org.apache.avro.Schema.createRecord(valueSchema.getName + "Key",
        null, valueSchema.getNamespace, false, fs)
    }
    def headerOf(id: Int): Array[Byte] =
      Array[Byte](0, (id >> 24).toByte, (id >> 16).toByte,
        (id >> 8).toByte, id.toByte)
    val keyHeader = headerOf(SchemaRegistry.registerSchema(registryUrls,
      s"$topic-key", keySchema.toString))
    val valueHeader = headerOf(SchemaRegistry.registerSchema(registryUrls,
      s"$topic-value", valueSchema.toString))
    val up = upsertForm(delta, keys)
    val cols = up.schema.fields.filterNot(_.name == "_op")
      .map(f => (f.name, f.dataType))
    val keyCols = cols.filter { case (n, _) => keys.contains(n) }
    val opIdx = up.columns.indexOf("_op")
    val keyJson = keySchema.toString
    val valueJson = valueSchema.toString
    val rows = up.rdd.mapPartitions { it =>
      val kSchema = new org.apache.avro.Schema.Parser().parse(keyJson)
      val vSchema = new org.apache.avro.Schema.Parser().parse(valueJson)
      val kWriter = new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](kSchema)
      val vWriter = new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](vSchema)
      val bos = new java.io.ByteArrayOutputStream()
      var encoder: org.apache.avro.io.BinaryEncoder = null
      def encode(writer: org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord],
          rec: org.apache.avro.generic.GenericRecord,
          header: Array[Byte]): Array[Byte] = {
        bos.reset()
        encoder = org.apache.avro.io.EncoderFactory.get()
          .binaryEncoder(bos, encoder)
        writer.write(rec, encoder)
        encoder.flush()
        header ++ bos.toByteArray
      }
      def put(rec: org.apache.avro.generic.GenericData.Record,
          row: org.apache.spark.sql.Row, fields: Array[(String, DataType)])
          : Unit =
        fields.foreach { case (name, dt) =>
          val v = row.getAs[Any](name)
          rec.put(name, (v, dt) match {
            case (null, _) => null
            case (b: Array[Byte], BinaryType) =>
              java.nio.ByteBuffer.wrap(b)
            case (x, _) => x
          })
        }
      it.map { row =>
        val kRec = new org.apache.avro.generic.GenericData.Record(kSchema)
        put(kRec, row, keyCols)
        val keyBytes = encode(kWriter, kRec, keyHeader)
        val valueBytes =
          if (row.getString(opIdx) == "delete") null
          else {
            val vRec =
              new org.apache.avro.generic.GenericData.Record(vSchema)
            put(vRec, row, cols)
            encode(vWriter, vRec, valueHeader)
          }
        org.apache.spark.sql.Row(keyBytes, valueBytes)
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType))))
  }

  /** Convert one Avro value to the Spark external value for `dt` —
    * recursive over nested records (the Debezium envelope's before/after
    * payloads are nested records).
    */
  private def avroValue(v: Any, dt: DataType, name: String): Any =
    if (v == null) null
    else dt match {
      case LongType => v.asInstanceOf[Number].longValue()
      case IntegerType => v.asInstanceOf[Number].intValue()
      case DoubleType => v.asInstanceOf[Number].doubleValue()
      case FloatType => v.asInstanceOf[Number].floatValue()
      case BooleanType => v.asInstanceOf[Boolean]
      case StringType => v.toString
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.get(out); out
      case st: StructType =>
        avroRow(v.asInstanceOf[org.apache.avro.generic.GenericRecord],
          st.fields.map(f => (f.name, f.dataType)))
      case other => throw new IllegalArgumentException(
        s"avro decode: unmapped type $other for field $name")
    }

  /** Convert one Avro generic record to a Row by field name. */
  private def avroRow(rec: org.apache.avro.generic.GenericRecord,
      fields: Array[(String, DataType)]): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row.fromSeq(fields.toIndexedSeq.map {
      case (name, dt) => avroValue(rec.get(name), dt, name)
    })

  /** [[avroRow]] tolerating columns ABSENT from the writer schema (→
    * NULL) — the schema-evolution contract of the registry path, where a
    * backlog mixes writer versions and older records simply predate newer
    * columns. The fixed-schema paths keep failing fast instead.
    */
  private def avroRowLenient(rec: org.apache.avro.generic.GenericRecord,
      fields: Array[(String, DataType)]): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row.fromSeq(fields.toIndexedSeq.map {
      case (name, dt) =>
        if (rec.getSchema.getField(name) == null) null
        else avroValue(rec.get(name), dt, name)
    })

  /** Debezium-over-Avro envelope decode (the reference's avro CDC input,
    * crates/adapters/src/format/avro/debezium.rs): each binary record is
    * a Debezium value envelope `{before, after, op, ...}` with nested
    * row records. Z-set semantics per op, matching the JSON debezium
    * path: `c`/`r` → +after, `d` → −before, `u` → −before AND +after.
    * Optional Confluent framing as in [[decodeAvro]].
    */
  def decodeAvroDebezium(raw: DataFrame, schema: StructType,
      avroSchemaJson: String, valueCol: String = "value",
      confluentWire: Boolean = false): DataFrame = {
    val spark = raw.sparkSession
    val fields = schema.fields.map(f => (f.name, f.dataType))
    val bytesRdd = raw.select(col(valueCol)).rdd
      .map(_.getAs[Array[Byte]](0))
    val rows = bytesRdd.mapPartitions { it =>
      val avSchema = new org.apache.avro.Schema.Parser()
        .parse(avroSchemaJson)
      val reader = new org.apache.avro.generic
        .GenericDatumReader[org.apache.avro.generic.GenericRecord](avSchema)
      var decoder: org.apache.avro.io.BinaryDecoder = null
      it.flatMap { bytes =>
        val payload =
          if (confluentWire) java.util.Arrays.copyOfRange(bytes, 5, bytes.length)
          else bytes
        decoder = org.apache.avro.io.DecoderFactory.get()
          .binaryDecoder(payload, decoder)
        val rec = reader.read(null, decoder)
        def side(f: String): Option[org.apache.spark.sql.Row] =
          Option(rec.get(f)).map(r => avroRow(
            r.asInstanceOf[org.apache.avro.generic.GenericRecord], fields))
        def signed(r: org.apache.spark.sql.Row, w: Long) =
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ w)
        rec.get("op").toString match {
          case "c" | "r" => side("after").map(signed(_, 1L)).toSeq
          case "d" => side("before").map(signed(_, -1L)).toSeq
          case "u" => side("before").map(signed(_, -1L)).toSeq ++
            side("after").map(signed(_, 1L)).toSeq
          case other => throw new IllegalArgumentException(
            s"debezium avro: unknown op '$other'")
        }
      }
    }
    spark.createDataFrame(rows, StructType(
      schema.fields :+ StructField(ZSets.W, LongType)))
  }

  /** Avro OBJECT CONTAINER FILES (the standard `.avro` file layout, with
    * the writer schema embedded in the header) → insert Z-set. Files load
    * through the binaryFile source and decode per partition with the
    * bundled Avro core; `readerSchema` optionally overrides projection
    * (schema resolution rules apply). One task per file — the container
    * format is splittable at block boundaries, but file granularity is
    * the honest local implementation and matches the reference's
    * per-object ingestion unit.
    */
  def decodeAvroContainer(spark: org.apache.spark.sql.SparkSession,
      path: String, schema: StructType,
      readerSchema: Option[String] = None): DataFrame = {
    val fields = schema.fields.map(f => (f.name, f.dataType))
    val files = spark.read.format("binaryFile").load(path)
      .select(col("content")).rdd.map(_.getAs[Array[Byte]](0))
    val rows = files.mapPartitions { it =>
      it.flatMap { bytes =>
        val reader = readerSchema match {
          case Some(s) => new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord](
            null, new org.apache.avro.Schema.Parser().parse(s))
          case None => new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]()
        }
        val stream = new org.apache.avro.file.DataFileStream(
          new java.io.ByteArrayInputStream(bytes), reader)
        try {
          import scala.jdk.CollectionConverters._
          stream.iterator().asScala.map(avroRow(_, fields)).toVector
        } finally stream.close()
      }
    }
    spark.createDataFrame(rows, schema).withColumn(ZSets.W, lit(1L))
  }

  /** Format dispatch used by the transports: JSON update envelopes, CSV
    * records, and binary Avro records — writer schema either passed
    * explicitly (`avroSchema`) or resolved from a Confluent-compatible
    * registry (`registryUrls`, Confluent-framed records).
    */
  def decode(raw: DataFrame, schema: StructType, format: String,
      valueCol: String = "value",
      avroSchema: Option[String] = None,
      registryUrls: Option[String] = None): DataFrame =
    format.toLowerCase match {
      case "csv" => decodeCsv(raw, schema, valueCol = valueCol)
      case "avro" => (avroSchema, registryUrls) match {
        case (Some(s), _) => decodeAvro(raw, schema, s, valueCol)
        case (None, Some(urls)) =>
          decodeAvroRegistry(raw, schema, urls, valueCol)
        case (None, None) => throw new IllegalStateException(
          "avro format needs a writer schema: pass the connector " +
            "property 'avro_schema', or 'registry_urls' for " +
            "schema-registry resolution of Confluent-framed records")
      }
      case json => decodeJson(raw, schema, json, valueCol)
    }
}
