package graft.sources

import scala.jdk.CollectionConverters._
import scala.util.Try

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ddl.Ddl
import graft.zset.ZSets

/** Connector dispatch for the reference's `WITH ('connectors' = '[...]')`
  * table clause (docs connectors/; crates/adapters/src/transport/):
  * transport name + config → a Spark reader.
  *
  *  - `file_input`          → batch/stream file read + [[Envelopes]] decode
  *  - `datagen`             → deterministic generator from the table schema
  *    (transport/datagen.rs's role; seeded, reproducible)
  *  - `jdbc_input` / `postgresql_input` → Spark's JDBC source (tested
  *    against the embedded Derby driver in this environment)
  *  - `delta_table_input` / `delta_table_output` → the NATIVE Delta log
  *    reader/writer in [[DeltaLake]] (snapshot/follow/snapshot_and_follow/
  *    cdc modes; no delta jar needed — the log protocol is JSON+parquet)
  *  - `kafka_input`, `iceberg_input` → dispatch to the corresponding
  *    DataSource format, JAR-GATED: the code path resolves the format at
  *    runtime and raises a precise error when the connector jar is absent
  *    (neither ships in this container), rather than failing inside
  *    Spark's classloader.
  *
  * Sink side: [[writeView]] covers file/jdbc/noop sinks symmetrically.
  */
object Connectors {

  final case class ConnectorConf(transport: String,
      config: Map[String, String], format: String,
      formatConfig: Map[String, String],
      softDelete: Boolean = false,
      name: Option[String] = None,
      paused: Boolean = false,
      /** Index name (connectors/unique_keys.md): output connectors merge
        * each index key's delete+insert pair into one atomic update.
        */
      index: Option[String] = None)

  /** Resolve `${env:NAME}` and `${secret:kubernetes:name/key}` references
    * in a connector config value (connectors/secret-references.md).
    * Environment references read the pipeline process environment; secret
    * references read the control plane's mounted secret files —
    * `$GRAFT_SECRETS_DIR/<name>/<key>`, the shape a Kubernetes volume
    * mount produces. Resolution happens at connector-parse time and
    * resolved values are never written back to DDL/journals.
    */
  /** Default reference source: the process environment, with Java system
    * properties as a fallback for embedded hosts (a JVM cannot set its
    * own env vars, so an embedding application — or a test harness —
    * stages references via `sys.props`; a real env var always wins).
    */
  private[graft] def defaultEnv(name: String): Option[String] =
    sys.env.get(name).orElse(sys.props.get(name))

  private[graft] def resolveRefs(value: String,
      env: String => Option[String] = defaultEnv): String = {
    val re = """\$\{(env|secret):([^}]+)\}""".r
    re.replaceAllIn(value, m => {
      val resolved = m.group(1) match {
        case "env" => env(m.group(2)).getOrElse(
          sys.error(s"unresolved env reference: ${m.group(2)}"))
        case "secret" => m.group(2).split(":", 2) match {
          case Array("kubernetes", ident) =>
            val root = env("GRAFT_SECRETS_DIR").getOrElse(
              sys.error("secret reference needs GRAFT_SECRETS_DIR " +
                "(the mounted-secrets root)"))
            val p = java.nio.file.Paths.get(root, ident.split("/"): _*)
            require(java.nio.file.Files.isRegularFile(p),
              s"secret not mounted: $ident")
            new String(java.nio.file.Files.readAllBytes(p),
              java.nio.charset.StandardCharsets.UTF_8).trim
          case other => sys.error(
            s"unknown secret provider: ${other.head}")
        }
      }
      scala.util.matching.Regex.quoteReplacement(resolved)
    })
  }

  private val mapper = new ObjectMapper()

  /** Parse the `connectors` property JSON array. */
  def parse(json: String): Seq[ConnectorConf] = {
    val root = mapper.readTree(json)
    require(root.isArray, "connectors property must be a JSON array")
    root.elements().asScala.map { c =>
      def cfg(node: com.fasterxml.jackson.databind.JsonNode): Map[String, String] =
        if (node == null || node.get("config") == null) Map.empty
        else node.get("config").properties().asScala
          .map(e => e.getKey -> (
            // nested config values (e.g. datagen's `plan` array) survive
            // as their JSON text; scalars stay raw strings
            if (e.getValue.isValueNode) resolveRefs(e.getValue.asText())
            else mapper.writeValueAsString(e.getValue))).toMap
      val tr = c.get("transport")
      val fm = c.get("format")
      ConnectorConf(
        if (tr == null) "file_input" else tr.get("name").asText(),
        cfg(tr),
        if (fm == null || fm.get("name") == null) "json"
        else fm.get("name").asText(),
        cfg(fm),
        softDelete = c.get("soft_delete") != null
          && c.get("soft_delete").asBoolean(false),
        name = Option(c.get("name")).map(_.asText()),
        paused = c.get("paused") != null && c.get("paused").asBoolean(false),
        index = Option(c.get("index")).map(_.asText()))
    }.toSeq
  }

  def connectorsOf(t: Ddl.TableDef): Seq[ConnectorConf] =
    t.properties.get("connectors").map(parse).getOrElse(Nil)

  def connectorsOf(v: Ddl.ViewDef): Seq[ConnectorConf] =
    v.properties.get("connectors").map(parse).getOrElse(Nil)

  /** Is a DataSource format resolvable on this classpath? */
  def formatAvailable(spark: SparkSession, fmt: String): Boolean =
    Try(org.apache.spark.sql.execution.datasources.DataSource
      .lookupDataSource(fmt, spark.sessionState.conf)).isSuccess

  /** Batch-read one connector of a table as a Z-set delta (`_w` = +1 for
    * plain rows; update formats decode through [[Envelopes]]).
    */
  def read(spark: SparkSession, table: Ddl.TableDef,
      conf: ConnectorConf): DataFrame = {
    val schema = FileSource.schemaOf(table)
    val decoded = conf.transport match {
      case "file_input" | "url_input" =>
        val rawPath = conf.config.getOrElse("path",
          conf.config.getOrElse("paths", sys.error("file connector: no path")))
        // url_input with an http(s) URL (connectors/sources/http-get.md):
        // fetched once with GET into a scratch file, then decoded like
        // any file — config-data scale, a driver-side fetch by design
        // (the reference's url transport streams the same single body)
        val path = if (rawPath.startsWith("http://")
            || rawPath.startsWith("https://")) {
          val tmp = java.nio.file.Files.createTempFile("url_input", ".dat")
          val resp = java.net.http.HttpClient.newHttpClient().send(
            java.net.http.HttpRequest.newBuilder()
              .uri(java.net.URI.create(rawPath)).GET().build(),
            java.net.http.HttpResponse.BodyHandlers.ofFile(tmp))
          require(resp.statusCode() == 200,
            s"url_input GET $rawPath returned HTTP ${resp.statusCode()}")
          tmp.toString
        } else rawPath
        conf.format match {
          case "json" =>
            val update = conf.formatConfig.getOrElse("update_format", "raw")
            Envelopes.decodeJson(spark.read.text(path), schema, update,
              defaults = defaultsOf(table, conf.config))
          case "csv" =>
            ZSets.lift(spark.read.schema(schema)
              .options(conf.formatConfig).csv(path))
          case "parquet" => ZSets.lift(spark.read.parquet(path))
          case "raw" =>
            // formats/raw.md: UNPARSED bytes into one VARBINARY/VARCHAR
            // column; `mode` lines (split on \n) or blob (whole object =
            // one row); other columns must have defaults. Insert-only by
            // contract (no metadata to express deletions).
            val mode = conf.formatConfig.getOrElse("mode", "blob")
            val target = conf.formatConfig.get("column_name").getOrElse {
              require(schema.fields.length == 1,
                "raw format: column_name is required when the table has " +
                  "more than one column")
              schema.fields.head.name
            }
            val dt = schema(target).dataType
            val raw = mode match {
              case "lines" =>
                spark.read.text(path).select(col("value").cast(dt).as(target))
              case "blob" =>
                spark.read.format("binaryFile").load(path)
                  .select(col("content").cast(dt).as(target))
              case other => sys.error(s"raw format: unknown mode $other")
            }
            val defaults = defaultsOf(table, conf.config)
            val full = schema.fields.foldLeft(raw) { (df, fld) =>
              if (fld.name == target) df
              else df.withColumn(fld.name,
                defaults.get(fld.name).map(d => expr(d).cast(fld.dataType))
                  .getOrElse(lit(null).cast(fld.dataType)))
            }
            ZSets.lift(full.select(schema.fieldNames.map(col).toSeq: _*))
          case "avro" =>
            // binary avro record files: one record per binaryFile row is
            // not the avro container format — read container files via
            // the bundled core library per partition
            Envelopes.decodeAvroContainer(spark, path, schema,
              conf.formatConfig.get("avro_schema"))
          case other => sys.error(s"unsupported file format: $other")
        }
      case "empty" =>
        // connectors/sources/empty.md: a source that produces no rows —
        // used to declare a table whose data arrives only via ad-hoc
        // INSERT / the HTTP ingress
        ZSets.lift(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
      case "datagen" =>
        ZSets.lift(Datagen.generate(spark, table, conf.config))
      case "jdbc_input" | "postgresql_input" =>
        // the reference's postgres connector shape (connectors/sources/
        // postgresql.md): `uri` = postgres URL, `query` = arbitrary
        // SELECT whose rows are ingested. postgres:// URIs translate to
        // the JDBC spelling with credentials split out; plain jdbc urls
        // pass through.
        val (url, creds) = jdbcUrlCreds(conf)
        val reader0 = spark.read.format("jdbc").option("url", url)
        val reader1 = creds.map { case (user, pass) =>
          reader0.option("user", user).option("password", pass)
        }.getOrElse(reader0)
        val reader = conf.config.get("query") match {
          case Some(q) => reader1.option("query", q.stripSuffix(";"))
          case None => reader1.option("dbtable",
            conf.config.getOrElse("table", table.name))
        }
        ZSets.lift(conf.config.get("driver")
          .map(d => reader.option("driver", d)).getOrElse(reader).load())
      case "postgres_cdc_input" =>
        // native logical-replication rounds (sources/PgCdc.scala):
        // slot + snapshot on the first round, pgoutput change streams
        // from the confirmed-flush LSN after
        PgCdc.readRound(spark, table, conf)
      case "kafka_input" =>
        // NATIVE wire-protocol round (sources/Kafka.scala): fetch
        // exactly (cursor, current-high] per partition, decode through
        // the format layer. A spark-sql-kafka DataSource, when present
        // on the classpath, can still serve executor-parallel streaming
        // backfills — dispatch stays here for the zero-jar contract.
        Kafka.readRound(spark, table, conf)
      case "delta_table_input" =>
        // native Delta log reader (sources/DeltaLake.scala) — no delta
        // jar needed; object-store URIs additionally need their Hadoop
        // FileSystem on the classpath (same probe as s3_input)
        val uri = conf.config("uri")
        val scheme = Option(java.net.URI.create(uri).getScheme)
          .getOrElse("file")
        if (!Set("file", "hdfs").contains(scheme)) try {
          org.apache.hadoop.fs.FileSystem.getFileSystemClass(
            scheme, spark.sparkContext.hadoopConfiguration); ()
        } catch {
          case scala.util.control.NonFatal(_) => sys.error(
            s"delta_table_input needs a Hadoop FileSystem for scheme " +
              s"'$scheme' (add the object-store jars and credentials)")
        }
        val cf = conf.config
        val mode = cf.getOrElse("mode", "snapshot")
        val version = cf.get("version").orElse(cf.get("start_version"))
          .map(_.toLong)
        val endVersion = cf.get("end_version").map(_.toLong)
        val datetime = cf.get("datetime")
        val startV = version
          .orElse(datetime.map(DeltaLake.versionAt(spark, uri, _)))
        mode match {
          case "snapshot" =>
            ZSets.lift(DeltaLake.snapshot(spark, uri, version, datetime,
              cf.get("filter"), cf.get("snapshot_filter")))
          case "follow" =>
            DeltaLake.changes(spark, uri,
              startV.getOrElse(DeltaLake.reconstruct(spark, uri).version),
              endVersion, cf.get("filter"))
          case "snapshot_and_follow" =>
            val snapV = startV.getOrElse(
              DeltaLake.reconstruct(spark, uri).version)
            ZSets.lift(DeltaLake.snapshot(spark, uri, Some(snapV), None,
                cf.get("filter"), cf.get("snapshot_filter")))
              .unionAll(DeltaLake.changes(spark, uri, snapV, endVersion,
                cf.get("filter")))
          case "cdc" =>
            DeltaLake.cdc(spark, uri,
              startV.getOrElse(-1L),
              cf.get("cdc_delete_filter").orElse(cf.get("cdc_delete_filer")),
              cf.get("cdc_order_by"), endVersion, cf.get("filter"))
          case other => sys.error(s"delta_table_input: unknown mode $other")
        }
      case "iceberg_input" =>
        // native Iceberg metadata reader (sources/IcebergLake.scala) — no
        // iceberg jar needed. Resolution order: metadata_location
        // (catalog-free snapshot, the doc's direct-read path), a REST
        // catalog (catalog_type=rest + table_name + rest.* — snapshot
        // AND follow: each round re-loads the table's metadata location
        // from the catalog), or a filesystem table directory
        // (version-hint.text, the Hadoop catalog layout). Glue/S3-Tables
        // catalogs need live AWS services absent here.
        val cf = conf.config
        val snapId = cf.get("snapshot_id").map(_.toLong)
        val endId = cf.get("end_snapshot_id").map(_.toLong)
        val datetime = cf.get("datetime")
        val mode = cf.getOrElse("mode", "snapshot")
        val metaLoc = cf.get("metadata_location")
        require(mode == "snapshot" || metaLoc.isEmpty,
          "follow modes cannot be used with metadata_location " +
            "(it pins a fixed snapshot); configure a catalog or point " +
            "uri at the table directory")
        def resolvedMeta = resolveIcebergMetadata(spark, cf)
        mode match {
          case "snapshot" =>
            ZSets.lift(IcebergLake.snapshot(spark, resolvedMeta, snapId,
              datetime, cf.get("snapshot_filter")))
          case "follow" =>
            val loc = resolvedMeta
            val meta = IcebergLake.readMetadata(spark, loc)
            val start = snapId.orElse(meta.currentSnapshotId)
            IcebergLake.changesFromMetadata(spark, loc, start, endId,
              cf.get("filter"))
          case "snapshot_and_follow" =>
            val loc = resolvedMeta
            val start = snapId
            ZSets.lift(IcebergLake.snapshot(spark, loc, start,
                datetime, cf.get("snapshot_filter")))
              .unionAll(IcebergLake.changesFromMetadata(spark, loc,
                start.orElse(IcebergLake.readMetadata(spark, loc)
                  .currentSnapshotId),
                endId, cf.get("filter")))
          case other => sys.error(s"iceberg_input: unknown mode $other")
        }
      case "s3_input" =>
        // object storage is a FILESYSTEM to Spark: an s3a:// path through
        // the normal file readers, provided hadoop-aws + credentials are
        // on the classpath — gate with a precise probe instead of letting
        // a raw ClassNotFound surface mid-scan
        val uri = conf.config.getOrElse("uri",
          conf.config.getOrElse("path", sys.error("s3 connector: no uri")))
        val scheme = java.net.URI.create(uri).getScheme
        try {
          org.apache.hadoop.fs.FileSystem.getFileSystemClass(
            scheme, spark.sparkContext.hadoopConfiguration); ()
        } catch {
          case scala.util.control.NonFatal(_) => sys.error(
            s"s3_input needs a Hadoop FileSystem for scheme '$scheme' " +
              "(add hadoop-aws + aws-sdk-bundle jars and fs.s3a credentials)")
        }
        read(spark, table, conf.copy(transport = "file_input",
          config = conf.config + ("path" -> uri)))
      case "nats_input" =>
        // native JetStream ordered-pull round (sources/Nats.scala): pull
        // everything currently available past this connector's sequence
        // cursor, decode through the format layer like any transport
        Nats.readRound(spark, table, conf)
      case "redis_output" =>
        sys.error("redis_output is a SINK transport (writeView); it " +
          "cannot feed a table")
      case "pub_sub_input" =>
        // native REST pull round (sources/PubSub.scala): emulator mode
        // plain-HTTP, real service via OAuth JWT-bearer credentials
        PubSub.readRound(spark, table, conf)
      case other => sys.error(s"unknown transport: $other")
    }
    if (conf.softDelete) applySoftDelete(table, decoded) else decoded
  }

  /** `soft_delete` connector property (connectors/#soft_delete,
    * streaming.md "Soft deletes with temporal filters"): every change
    * becomes an INSERTION — the table is a log, not a mirrored relation —
    * and the change kind lands in any column whose DEFAULT reads
    * `CONNECTOR_METADATA()['is_delete']`. Retraction weights flip to
    * insertions of the same multiplicity; the per-connector
    * metadata-folding in [[defaultsOf]] leaves those columns null (the
    * key is row-level, absent from the folded constant), so filling
    * nulls from the pre-flip sign here completes the contract.
    */
  /** Current metadata-file location of an Iceberg connector's table:
    * explicit `metadata_location`, a REST catalog loadTable, or the
    * filesystem layout's version hint.
    */
  def resolveIcebergMetadata(spark: SparkSession,
      cf: Map[String, String]): String = cf.get("catalog_type") match {
    case Some("rest") =>
      IcebergRest.connect(cf).tableMetadataLocation(
        cf.getOrElse("table_name",
          sys.error("iceberg_input: catalog_type=rest needs table_name " +
            "(namespace.table)")))
    case Some("glue") =>
      IcebergGlue.tableMetadataLocation(cf,
        cf.getOrElse("table_name",
          sys.error("iceberg_input: catalog_type=glue needs table_name " +
            "(database.table)")))
    case Some("s3tables") =>
      IcebergS3Tables.tableMetadataLocation(cf,
        cf.getOrElse("table_name",
          sys.error("iceberg_input: catalog_type=s3tables needs " +
            "table_name (namespace.table)")))
    case Some(other) =>
      sys.error(s"iceberg_input catalog_type=$other not supported; " +
        "use rest, glue, s3tables, metadata_location (direct read), or " +
        "a filesystem table dir (version-hint.text)")
    case None => cf.get("metadata_location").getOrElse(
      IcebergLake.currentMetadata(spark,
        cf.get("uri").orElse(cf.get("path")).getOrElse(
          sys.error("iceberg_input: set metadata_location, " +
            "catalog_type, or uri"))))
  }

  private def applySoftDelete(table: Ddl.TableDef,
      decoded: DataFrame): DataFrame = {
    val isDeleteRe =
      "(?is).*CONNECTOR_METADATA\\s*\\(\\s*\\)\\s*\\[\\s*'is_delete'.*"
    val targets = table.columns.filter(_.default.exists(_.matches(isDeleteRe)))
    val filled = targets.foldLeft(decoded) { (df, c) =>
      df.withColumn(c.name, coalesce(col(c.name),
        (col(ZSets.W) < 0).cast(graft.types.SqlTypes.toSpark(c.sqlType))))
    }
    filled.withColumn(ZSets.W, abs(col(ZSets.W)))
  }

  /** Decode a Kafka record batch into a Z-set delta. `records` carries
    * the EXACT relation the spark-sql-kafka source produces (key/value
    * BINARY + topic/partition/offset/timestamp); payload bytes are UTF-8
    * JSON update envelopes, decoded by [[Envelopes.decodeJson]] — the
    * reference's kafka transport + json format pairing
    * (crates/adapters/src/transport/kafka/). Split out from the
    * broker-reading path so the wire decode is testable (and reusable for
    * a recorded-bytes replay) without Kafka jars or a broker.
    */
  def decodeKafkaBatch(records: DataFrame,
      schema: org.apache.spark.sql.types.StructType,
      updateFormat: String, format: String = "json",
      avroSchema: Option[String] = None,
      registryUrls: Option[String] = None,
      defaults: Map[String, String] = Map.empty): DataFrame =
    format.toLowerCase match {
      case "avro" =>
        // binary payloads stay binary: explicit writer schema, or
        // Confluent-framed with registry resolution (`registry_urls`)
        Envelopes.decode(records.select(col("value")), schema, "avro",
          avroSchema = avroSchema, registryUrls = registryUrls)
      case _ =>
        Envelopes.decodeJson(records.select(col("value").cast("string")),
          schema, updateFormat, defaults = defaults)
    }

  /** Column → DEFAULT-expression map for a table, with
    * CONNECTOR_METADATA() resolved against this connector's transport
    * config (grammar.md:140-151: the built-in returns a nullable VARIANT
    * of connector-specific values, indexable as `[...'key']`).
    */
  def defaultsOf(table: Ddl.TableDef,
      connectorConfig: Map[String, String]): Map[String, String] =
    table.columns.flatMap(c =>
      c.default.map(d => c.name -> substMetadata(d, connectorConfig))).toMap

  private val MetaIndexedRe =
    """(?i)CONNECTOR_METADATA\s*\(\s*\)\s*\[\s*'([^']+)'\s*\]""".r
  private val MetaBareRe = """(?i)CONNECTOR_METADATA\s*\(\s*\)""".r

  /** Rewrite CONNECTOR_METADATA() calls in a DEFAULT expression into
    * literals over this connector's config: the reference evaluates the
    * built-in against per-connector metadata at ingest time; here the
    * metadata is a constant per (table, connector) pair, so it folds into
    * the decode plan as a variant literal — zero per-row cost.
    */
  def substMetadata(exprSql: String,
      meta: Map[String, String]): String = {
    val json = meta.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""${escape(k)}": "${escape(v)}"""" }.mkString("{", ", ", "}")
    val lit = s"parse_json('${json.replace("'", "''")}')"
    val s1 = MetaIndexedRe.replaceAllIn(exprSql, m =>
      scala.util.matching.Regex.quoteReplacement(
        s"variant_get($lit, '$$.${m.group(1)}')"))
    MetaBareRe.replaceAllIn(s1,
      scala.util.matching.Regex.quoteReplacement(lit))
  }

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Sink side: write a view's rows through a connector config.
    * `indexKeys` (resolved from the connector's `index` property against
    * the program's CREATE INDEX declarations — connectors/unique_keys.md)
    * switches the sink to ATOMIC-UPDATE form: each key's delete+insert
    * pair becomes one update (json envelope) or one keyed overwrite
    * (jdbc), instead of separate delete and insert events.
    */
  def writeView(df: DataFrame, conf: ConnectorConf,
      indexKeys: Option[Seq[String]] = None): Unit =
    conf.transport match {
      case "file_output" =>
        val path = conf.config("path")
        conf.format match {
          case "parquet" => df.write.mode("append").parquet(path)
          case "csv" => df.write.mode("append")
            .options(conf.formatConfig).csv(path)
          // indexed connector + Z-set delta → atomic upsert envelopes;
          // encodable update_format set + weights → envelope lines (the
          // reference's egress wire contract). raw/debezium are INGRESS
          // formats here (decodeJson accepts them; egress encoding is not
          // implemented) — they fall back to plain JSON rows rather than
          // failing at write time.
          case "json" if indexKeys.isDefined
              && df.columns.contains(graft.zset.ZSets.W) =>
            Envelopes.encodeJsonUpserts(df, indexKeys.get)
              .write.mode("append").text(path)
          case "json" => conf.formatConfig.get("update_format") match {
            case Some(uf) if Envelopes.encodableFormats(uf.toLowerCase)
                && df.columns.contains(graft.zset.ZSets.W) =>
              Envelopes.encodeJson(df, uf).write.mode("append").text(path)
            case _ => df.write.mode("append").json(path)
          }
          case other => sys.error(s"unsupported file sink format: $other")
        }
      case "jdbc_output" | "postgresql_output"
          if conf.config.getOrElse("mode", "materialized") == "cdc"
            && df.columns.contains(graft.zset.ZSets.W) =>
        // CDC mode (sinks/postgresql.md): each change APPENDS to the
        // target table as a row carrying the documented metadata
        // columns — cdc_op_column ∈ i/u/d, cdc_ts_column = output
        // timestamp in MICROSECONDS. Unique keys are required (the
        // connector's uniqueness contract) so delete/update fold to one
        // keyed record each.
        require(indexKeys.isDefined, "postgresql_output mode=cdc needs " +
          "a view with unique keys (CREATE INDEX / connector index)")
        val opC = conf.config.getOrElse("cdc_op_column", "__feldera_op")
        val tsC = conf.config.getOrElse("cdc_ts_column", "__feldera_ts")
        val (url, creds) = jdbcUrlCreds(conf)
        val nowMicros = System.currentTimeMillis() * 1000L
        val out = Envelopes.upsertForm(df, indexKeys.get)
          .withColumn(opC,
            when(col("_op") === "insert", lit("i"))
              .when(col("_op") === "update", lit("u"))
              .otherwise(lit("d")))
          .drop("_op")
          .withColumn(tsC, lit(nowMicros))
        val w0 = out.write.format("jdbc").mode("append")
          .option("url", url)
          .option("dbtable", conf.config("table"))
        val w1 = creds.map { case (u, p) =>
          w0.option("user", u).option("password", p) }.getOrElse(w0)
        conf.config.get("driver").map(d => w1.option("driver", d))
          .getOrElse(w1).save()
      case "jdbc_output" | "postgresql_output"
          if indexKeys.isDefined
            && df.columns.contains(graft.zset.ZSets.W) =>
        jdbcKeyedMerge(df, conf, indexKeys.get)
      case "jdbc_output" | "postgresql_output" =>
        val (url, creds) = jdbcUrlCreds(conf)
        val w0 = df.write.format("jdbc").mode("append")
          .option("url", url)
          .option("dbtable", conf.config("table"))
        val w1 = creds.map { case (u, p) =>
          w0.option("user", u).option("password", p) }.getOrElse(w0)
        conf.config.get("driver").map(d => w1.option("driver", d))
          .getOrElse(w1).save()
      case "iceberg_output" =>
        // the reference supports Iceberg output only indirectly (avro
        // CDC records through Kafka Connect, connectors/sinks/iceberg.md);
        // with the native writer we can land the same CDC record shape
        // directly: data columns + the cdc_field op column (I/D) — the
        // exact relation the Iceberg Sink Kafka Connector would build.
        val cdcField = conf.formatConfig.getOrElse("cdc_field", "op")
        val dI = if (df.columns.contains(graft.zset.ZSets.W)) df
          else graft.zset.ZSets.lift(df)
        val wc = col(graft.zset.ZSets.W)
        val dataCols = graft.zset.ZSets.dataCols(dI).map(col)
        val expanded = dI
          .withColumn(cdcField, when(wc < 0, lit("D")).otherwise(lit("I")))
          .withColumn("__n", explode(sequence(lit(1L), abs(wc))))
          .select(dataCols :+ col(cdcField): _*)
        IcebergLake.append(dI.sparkSession, conf.config("uri"), expanded)
        ()
      case "delta_table_output" =>
        // docs/connectors/sinks/delta.md: deltas append as a change log
        // with __feldera_op / __feldera_ts metadata columns (the merge
        // job is DeltaLake.integrateChangeLog)
        val d = if (df.columns.contains(graft.zset.ZSets.W)) df
          else graft.zset.ZSets.lift(df)
        DeltaLake.writeDelta(d.sparkSession, conf.config("uri"), d,
          System.currentTimeMillis()); ()
      case "kafka_output" =>
        // native Produce path (sources/Kafka.scala): the same envelope
        // bytes the file sinks write, delivered as record values
        val lines: DataFrame = conf.format match {
          case "json" if indexKeys.isDefined
              && df.columns.contains(graft.zset.ZSets.W) =>
            Envelopes.encodeJsonUpserts(df, indexKeys.get)
          case "json" => conf.formatConfig.get("update_format") match {
            case Some(uf) if Envelopes.encodableFormats(uf.toLowerCase)
                && df.columns.contains(graft.zset.ZSets.W) =>
              Envelopes.encodeJson(df, uf)
            case _ => df.select(to_json(struct(df.columns.filterNot(
              _ == graft.zset.ZSets.W).map(col).toSeq: _*)).as("value"))
          }
          case "avro" if conf.formatConfig.get("update_format")
              .contains("confluent_jdbc") =>
            // the Confluent JDBC sink envelope (sinks/confluent-jdbc.md):
            // keyed messages, value = row or tombstone; key columns from
            // key_fields, else the view's index, else ALL columns (the
            // documented default)
            val keyFields = conf.formatConfig.get("key_fields") match {
              case Some(jsonText) =>
                val node = mapper.readTree(jsonText)
                require(node.isArray,
                  "confluent_jdbc: key_fields must be a list")
                node.elements().asScala.map(_.asText()).toSeq
              case None => indexKeys.getOrElse(
                df.columns.filterNot(_ == graft.zset.ZSets.W).toSeq)
            }
            Envelopes.encodeAvroConfluentJdbc(df, keyFields,
              conf.formatConfig.getOrElse("avro_schema", sys.error(
                "kafka_output avro: avro_schema is required")),
              conf.formatConfig.getOrElse("registry_urls", sys.error(
                "confluent_jdbc: registry_urls is required")),
              conf.config.getOrElse("topic",
                sys.error("kafka_output: topic is required")))
          case "avro" =>
            Envelopes.encodeAvro(df,
              conf.formatConfig.getOrElse("avro_schema", sys.error(
                "kafka_output avro: avro_schema is required")),
              cdcField = conf.formatConfig.get("cdc_field"),
              registryUrls = conf.formatConfig.get("registry_urls"),
              subject = conf.formatConfig.get("subject"))
          case other =>
            sys.error(s"kafka_output: unsupported format $other")
        }
        if (lines.columns.sameElements(Array("key", "value"))) {
          // keyed delivery (confluent_jdbc): tombstones are None values
          val it = lines.toLocalIterator()
          val keyed = new Iterator[(Array[Byte], Option[Array[Byte]])] {
            def hasNext: Boolean = it.hasNext
            def next(): (Array[Byte], Option[Array[Byte]]) = {
              val r = it.next()
              (r.getAs[Array[Byte]](0),
                Option(r.getAs[Array[Byte]](1)))
            }
          }
          Kafka.writeRoundKeyed(keyed, conf)
        } else {
          val valueCol = lines.schema.fields.head
          val it = lines.toLocalIterator()
          val bytes = new Iterator[Array[Byte]] {
            def hasNext: Boolean = it.hasNext
            def next(): Array[Byte] = valueCol.dataType match {
              case org.apache.spark.sql.types.BinaryType =>
                it.next().getAs[Array[Byte]](0)
              case _ => it.next().getString(0)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            }
          }
          Kafka.writeRound(bytes, conf)
        }
        ()
      case "redis_output" =>
        // docs/connectors/sinks/redis.md: keyed row store, one atomic
        // MULTI..EXEC transaction per batch (sources/Redis.scala). The
        // key columns come from the json format's `key_fields` list.
        require(conf.format == "json",
          s"redis_output supports only the json format, got ${conf.format}")
        val keyFields = conf.formatConfig.get("key_fields") match {
          case Some(jsonText) =>
            val node = mapper.readTree(jsonText)
            require(node.isArray, "redis_output: key_fields must be a list")
            node.elements().asScala.map(_.asText()).toSeq
          case None => sys.error("redis_output: format config needs " +
            "key_fields (the columns forming the Redis key)")
        }
        Redis.writeUpserts(df, keyFields,
          conf.config.getOrElse("key_separator", ":"),
          conf.config.getOrElse("connection_string",
            sys.error("redis_output: connection_string is required")))
        ()
      case "dynamodb_output" =>
        // docs/connectors/sinks/dynamodb.md: indexed views only — the
        // index columns must be the DynamoDB table's primary key
        require(indexKeys.isDefined,
          "dynamodb_output requires an indexed view (CREATE INDEX + " +
            "the connector's `index` property): the index columns map " +
            "to the DynamoDB primary key")
        DynamoDb.writeUpserts(df, indexKeys.get, conf.config)
        ()
      case "null_output" => df.write.format("noop").mode("overwrite").save()
      case other => sys.error(s"unknown sink transport: $other")
    }

  /** Keyed JDBC delivery of a view output delta (the postgres-output
    * `index` behaviour): per index key, delete the old row and insert the
    * new one in ONE transaction per partition — idempotent updates
    * without a dialect-specific MERGE, exactly-the-delta I/O (no full
    * refresh). Runs per partition with one prepared statement pair; the
    * standard per-partition imperative escape hatch, not a per-row UDF.
    */
  /** `uri`/`url` config → (JDBC url, optional user/password). The
    * reference's postgres connector shape (connectors/sources/
    * postgresql.md, sinks/postgresql.md): postgres:// URIs translate to
    * the JDBC spelling with credentials split out; plain jdbc urls pass
    * through.
    */
  private def jdbcUrlCreds(
      conf: ConnectorConf): (String, Option[(String, String)]) = {
    val rawUri = conf.config.getOrElse("url",
      conf.config.getOrElse("uri",
        sys.error(s"${conf.transport}: set uri (or url)")))
    if (rawUri.startsWith("postgresql://")
        || rawUri.startsWith("postgres://")) {
      val u = java.net.URI.create(
        "postgresql://" + rawUri.split("://", 2)(1))
      val userInfo = Option(u.getUserInfo).map(_.split(":", 2))
      (s"jdbc:postgresql://${u.getHost}" +
        (if (u.getPort > 0) s":${u.getPort}" else "") + u.getPath +
        Option(u.getRawQuery).map("?" + _).getOrElse(""),
        userInfo.map(ui => (ui(0), if (ui.length > 1) ui(1) else "")))
    } else (rawUri, None)
  }

  private def jdbcKeyedMerge(delta: DataFrame, conf: ConnectorConf,
      keys: Seq[String]): Unit = {
    val (url, creds) = jdbcUrlCreds(conf)
    val table = conf.config("table")
    val driver = conf.config.get("driver")
    val up = Envelopes.upsertForm(delta, keys)
    val cols = up.columns.filterNot(_ == "_op").toSeq
    val delSql = s"DELETE FROM $table WHERE " +
      keys.map(k => s"$k = ?").mkString(" AND ")
    val insSql = s"INSERT INTO $table (${cols.mkString(", ")}) VALUES " +
      s"(${cols.map(_ => "?").mkString(", ")})"
    val keyIdx = keys.map(up.columns.indexOf(_))
    val colIdx = cols.map(up.columns.indexOf(_))
    val opIdx = up.columns.indexOf("_op")
    up.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        driver.foreach(Class.forName(_))
        val cn = creds match {
          case Some((u, p)) =>
            java.sql.DriverManager.getConnection(url, u, p)
          case None => java.sql.DriverManager.getConnection(url)
        }
        try {
          cn.setAutoCommit(false)
          val del = cn.prepareStatement(delSql)
          val ins = cn.prepareStatement(insSql)
          rows.foreach { r =>
            val op = r.getString(opIdx)
            if (op == "delete" || op == "update") {
              keyIdx.zipWithIndex.foreach { case (i, p) =>
                del.setObject(p + 1, r.get(i)) }
              del.addBatch()
            }
            if (op == "insert" || op == "update") {
              colIdx.zipWithIndex.foreach { case (i, p) =>
                ins.setObject(p + 1, r.get(i)) }
              ins.addBatch()
            }
          }
          del.executeBatch()
          ins.executeBatch()
          cn.commit()
        } finally cn.close()
      }
    }
  }
}
