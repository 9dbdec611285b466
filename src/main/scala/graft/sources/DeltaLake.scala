package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.zset.ZSets

/** Native Delta Lake table support — log protocol reader + append writer —
  * with zero dependencies beyond Spark itself (the `_delta_log` is plain
  * JSON + parquet).
  *
  * Implements the reference's Delta connectors
  * (docs/connectors/sources/delta.md, docs/connectors/sinks/delta.md;
  * crates/adapters/src/transport/delta_table/):
  *
  *  - read modes `snapshot`, `follow`, `snapshot_and_follow`, `cdc`
  *    (delete rows via `cdc_delete_filter`, update order via
  *    `cdc_order_by`), `version`/`datetime`/`end_version` pinning, and
  *    `filter`/`snapshot_filter` row predicates;
  *  - sink: every output delta appends as a change log with the
  *    documented `__feldera_op` / `__feldera_ts` metadata columns.
  *
  * Scale notes. The transaction log is METADATA — KBs per commit — so
  * driver-side JSON replay is the standard design (delta-rs and Spark's
  * own DeltaLog do the same); state reconstruction starts from the latest
  * parquet checkpoint at or below the target version, so replay cost is
  * O(commits since checkpoint), not O(table age). Data files are read as
  * ordinary distributed parquet scans. Partitioned snapshots are built as
  * a union of per-partition-tuple scans whose partition columns are
  * LITERALS: a `filter`/`snapshot_filter` over partition columns
  * constant-folds per branch, so Catalyst prunes non-matching partitions
  * to empty relations at plan time — Delta's partition pruning for free.
  */
object DeltaLake {

  private val mapper = new ObjectMapper()

  /** One data file of a table version (the `add` action's fields the
    * reader needs, including its deletion vector when present).
    */
  final case class AddFile(path: String,
      partitionValues: Map[String, String], size: Long,
      dv: Option[DeltaDv.Descriptor] = None)

  /** Reconstructed table state at one version. */
  final case class Snapshot(version: Long, schema: StructType,
      partitionColumns: Seq[String], files: Seq[AddFile],
      /** commitInfo/in-commit timestamp per replayed version (for
        * `datetime` resolution).
        */
      timestamps: Map[Long, Long],
      /** latest `txn` action version per application id (idempotent
        * writer bookkeeping, the protocol's transaction identifiers).
        */
      txns: Map[String, Long] = Map.empty,
      /** `delta.columnMapping.mode` from the table configuration:
        * "none", "name", or "id". Under name/id mapping the parquet
        * files store per-field physical names (kept in the schema's
        * field metadata) and `partitionValues` keys are physical.
        */
      columnMappingMode: String = "none",
      /** Latest protocol action (version pair + feature lists) — carried
        * so checkpoints re-emit it: a checkpoint must contain the
        * protocol action (commits before it may be cleaned up).
        */
      minReaderVersion: Int = 1, minWriterVersion: Int = 2,
      readerFeatures: Seq[String] = Seq.empty,
      writerFeatures: Seq[String] = Seq.empty)

  private def fs(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def logDir(dir: String) = new Path(dir, "_delta_log")

  /** List commit versions present as JSON files, ascending. */
  private def commitVersions(f: FileSystem, log: Path): Seq[Long] =
    if (!f.exists(log)) Seq.empty
    else f.listStatus(log).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && n.stripSuffix(".json").forall(_.isDigit))
      .map(_.stripSuffix(".json").toLong).sorted

  /** `_last_checkpoint` pointer, if one exists and is at or below
    * `maxVersion`.
    */
  private def checkpointAt(spark: SparkSession, f: FileSystem, log: Path,
      maxVersion: Long): Option[Long] = {
    val ptr = new Path(log, "_last_checkpoint")
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      val node = try mapper.readTree(in) finally in.close()
      Some(node.get("version").asLong()).filter(_ <= maxVersion)
    }
  }

  /** Replay the log into a [[Snapshot]] at `version` (latest when None).
    * Starts from the newest eligible parquet checkpoint, then applies
    * JSON commits after it.
    */
  def reconstruct(spark: SparkSession, dir: String,
      version: Option[Long] = None): Snapshot = {
    val (f, _) = fs(spark, dir)
    val log = logDir(dir)
    val versions = commitVersions(f, log)
    require(versions.nonEmpty || checkpointAt(spark, f, log, Long.MaxValue).isDefined,
      s"not a Delta table (no _delta_log commits): $dir")
    val target = version.getOrElse(
      (versions ++ checkpointAt(spark, f, log, Long.MaxValue)).max)
    val ckpt = checkpointAt(spark, f, log, target)

    var schema: StructType = null
    var partCols: Seq[String] = Seq.empty
    var mappingMode = "none"
    // path → AddFile; removes delete keys
    val live = scala.collection.mutable.LinkedHashMap[String, AddFile]()
    val stamps = scala.collection.mutable.Map[Long, Long]()
    val txns = scala.collection.mutable.Map[String, Long]()
    // latest protocol action wins (upgrades replace); gate on record
    var proto = (1, 2, Seq.empty[String], Seq.empty[String])
    def recordProtocol(mrv: Int, mwv: Int, rf: Seq[String],
        wf: Seq[String]): Unit = {
      gateProtocol(mrv, rf)
      proto = (mrv, mwv, rf, wf)
    }
    // shared JSON-action parsers (commit lines and V2 json manifests
    // carry the same action shapes)
    def recordProtocolJson(pr: JsonNode): Unit = recordProtocol(
      Option(pr.get("minReaderVersion")).map(_.asInt()).getOrElse(1),
      Option(pr.get("minWriterVersion")).map(_.asInt()).getOrElse(2),
      strList(pr.get("readerFeatures")), strList(pr.get("writerFeatures")))
    def recordMetaJson(m: JsonNode): Unit = {
      schema = DataType.fromJson(m.get("schemaString").asText())
        .asInstanceOf[StructType]
      partCols = Option(m.get("partitionColumns")).toSeq
        .flatMap(_.elements().asScala.map(_.asText()))
      mappingMode = Option(m.get("configuration"))
        .flatMap(c => Option(c.get("delta.columnMapping.mode")))
        .map(_.asText()).getOrElse("none")
    }
    def addFileJson(ad: JsonNode): AddFile = {
      val p = ad.get("path").asText()
      AddFile(p, partValues(ad.get("partitionValues")),
        Option(ad.get("size")).map(_.asLong()).getOrElse(0L), parseDv(ad))
    }

    ckpt.foreach { cv =>
      // absorb one checkpoint-shaped DataFrame: one row per action with
      // nullable structs add / metaData / txn (read via Spark — the
      // checkpoint can be large on wide tables, but we only collect add
      // paths + partition values + metaData, never data). `remove` rows
      // are vacuum tombstones, never live state — ignored by design.
      def absorbDf(cp: DataFrame): Unit = {
        val cols = cp.columns.toSet
        if (cols.contains("protocol")) {
          val pcols = cp.select("protocol.*").columns.toSet
          def opt(name: String): Seq[Column] =
            if (pcols.contains(name)) Seq(col(s"protocol.$name")) else Nil
          val sel = Seq(col("protocol.minReaderVersion")) ++
            opt("minWriterVersion") ++ opt("readerFeatures") ++
            opt("writerFeatures")
          val names = Seq("minReaderVersion") ++
            Seq("minWriterVersion", "readerFeatures", "writerFeatures")
              .filter(pcols.contains)
          cp.select(sel: _*)
            .where(col("minReaderVersion").isNotNull).collect()
            .foreach { r =>
              def seqAt(n: String): Seq[String] = {
                val i = names.indexOf(n)
                if (i >= 0 && !r.isNullAt(i)) r.getSeq[String](i)
                else Seq.empty
              }
              val mwvI = names.indexOf("minWriterVersion")
              recordProtocol(r.getAs[Number](0).intValue(),
                if (mwvI >= 0 && !r.isNullAt(mwvI))
                  r.getAs[Number](mwvI).intValue() else 2,
                seqAt("readerFeatures"), seqAt("writerFeatures"))
            }
        }
        if (cols.contains("metaData")) {
          val hasConf = cp.select("metaData.*").columns.contains("configuration")
          val sel = Seq(col("metaData.schemaString"),
            col("metaData.partitionColumns")) ++
            (if (hasConf) Seq(col("metaData.configuration")) else Nil)
          cp.select(sel: _*)
            .where(col("metaData.schemaString").isNotNull).collect()
            .foreach { r =>
              schema = DataType.fromJson(r.getString(0)).asInstanceOf[StructType]
              partCols = r.getSeq[String](1)
              if (hasConf && !r.isNullAt(2))
                mappingMode = r.getMap[String, String](2)
                  .getOrElse("delta.columnMapping.mode", "none")
            }
        }
        if (cols.contains("txn")) {
          cp.select("txn.appId", "txn.version")
            .where(col("txn").isNotNull).collect().foreach { r =>
              txns(r.getString(0)) = r.getLong(1)
            }
        }
        if (cols.contains("add")) {
          val hasDv = cp.select("add.*").columns.contains("deletionVector")
          val sel = Seq(col("add.path"), col("add.partitionValues"),
            col("add.size")) ++
            (if (hasDv) Seq(col("add.deletionVector")) else Nil)
          cp.select(sel: _*)
            .where(col("add.path").isNotNull).collect().foreach { r =>
              val dv = if (hasDv && !r.isNullAt(3)) {
                val d = r.getStruct(3)
                Some(DeltaDv.Descriptor(d.getAs[String]("storageType"),
                  d.getAs[String]("pathOrInlineDv"),
                  Option(d.getAs[Any]("offset")).map(_.toString.toLong),
                  d.getAs[Number]("sizeInBytes").intValue(),
                  d.getAs[Number]("cardinality").longValue()))
              } else None
              live(r.getString(0)) = AddFile(r.getString(0),
                Option(r.getMap[String, String](1)).map(_.toMap)
                  .getOrElse(Map.empty), r.getLong(2), dv)
            }
        }
      }
      // resolve the checkpoint's physical form by listing
      // (delta-io PROTOCOL.md "Checkpoints"): classic single-file
      // `n.checkpoint.parquet`, classic multi-part
      // `n.checkpoint.ppppppppp.NNNNNNNNNN.parquet`, or V2
      // `n.checkpoint.<uuid>.{json,parquet}` — a manifest holding the
      // non-file actions plus `sidecar` references to parquet files of
      // add/remove actions under `_delta_log/_sidecars/`
      val prefix = f"$cv%020d.checkpoint"
      val names = f.listStatus(log).toSeq.map(_.getPath.getName)
        .filter(_.startsWith(prefix + "."))
      val uuidRe = (java.util.regex.Pattern.quote(prefix) +
        "\\.[0-9a-fA-F-]{36}\\.(json|parquet)").r
      val partRe = (java.util.regex.Pattern.quote(prefix) +
        "\\.\\d{10}\\.\\d{10}\\.parquet").r
      val v2Manifest = names.find(n => uuidRe.matches(n)).map(new Path(log, _))
      val multiPartNames = names.filter(n => partRe.matches(n)).sorted
      // completeness: every name carries o-of-p; a lost part must fail
      // loudly, never yield a silently truncated snapshot
      if (multiPartNames.nonEmpty) {
        val op = multiPartNames.map { n =>
          val bits = n.stripSuffix(".parquet").split('.').takeRight(2)
          (bits(0).toInt, bits(1).toInt)
        }
        val totals = op.map(_._2).distinct
        require(totals.size == 1 &&
          op.map(_._1).toSet == (1 to totals.head).toSet,
          s"multi-part checkpoint at version $cv is incomplete: have " +
            s"parts ${op.map(_._1).mkString(",")} of ${totals.mkString(",")}")
      }
      val multiPart = multiPartNames.map(n => new Path(log, n).toString)
      v2Manifest match {
        case Some(mp) =>
          val sidecars: Seq[String] = if (mp.getName.endsWith(".json")) {
            // JSON manifest: one action per line, commit-shaped
            val in = f.open(mp)
            val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
              .getLines().toVector finally in.close()
            val sc = scala.collection.mutable.Buffer[String]()
            lines.foreach { line =>
              val a = mapper.readTree(line)
              if (a.has("protocol")) recordProtocolJson(a.get("protocol"))
              if (a.has("metaData")) recordMetaJson(a.get("metaData"))
              if (a.has("txn")) {
                val t = a.get("txn")
                txns(t.get("appId").asText()) = t.get("version").asLong()
              }
              if (a.has("add")) {
                val af = addFileJson(a.get("add"))
                live(af.path) = af
              }
              if (a.has("sidecar"))
                sc += a.get("sidecar").get("path").asText()
            }
            sc.toSeq
          } else {
            val cp = spark.read.parquet(mp.toString)
            absorbDf(cp)
            if (!cp.columns.contains("sidecar")) Seq.empty
            else cp.select("sidecar.path")
              .where(col("sidecar.path").isNotNull)
              .collect().map(_.getString(0)).toSeq
          }
          if (sidecars.nonEmpty) {
            // sidecar paths are names under _delta_log/_sidecars/ or
            // absolute URIs
            val paths = sidecars.map { s =>
              if (s.contains("://") || s.startsWith("/")) s
              else new Path(new Path(log, "_sidecars"), s).toString
            }
            absorbDf(spark.read.parquet(paths: _*))
          }
        case None if multiPart.nonEmpty =>
          absorbDf(spark.read.parquet(multiPart: _*))
        case None =>
          absorbDf(spark.read.parquet(
            new Path(log, s"$prefix.parquet").toString))
      }
    }

    versions.filter(v => v <= target && ckpt.forall(v > _)).foreach { v =>
      val in = f.open(new Path(log, f"$v%020d.json"))
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toVector finally in.close()
      val commitAdds =
        scala.collection.mutable.LinkedHashMap[String, AddFile]()
      val commitRemoves = scala.collection.mutable.Set[String]()
      lines.foreach { line =>
        val a = mapper.readTree(line)
        // refuse tables whose reader features this implementation does
        // not honor — silently mis-reading (ignoring deletion vectors,
        // resolving mapped column names wrong) is worse than failing
        if (a.has("protocol")) recordProtocolJson(a.get("protocol"))
        if (a.has("metaData")) recordMetaJson(a.get("metaData"))
        // protocol reconciliation: a commit's state transition is
        // (live ∖ removes) ∪ adds, INDEPENDENT of action order within
        // the commit — a DML that rewrites a file's deletion vector
        // emits both a remove (old DV) and an add (new DV) for the
        // same path, and the add must win
        if (a.has("add")) {
          val af = addFileJson(a.get("add"))
          commitAdds(af.path) = af
        }
        if (a.has("remove"))
          commitRemoves += a.get("remove").get("path").asText()
        if (a.has("txn")) {
          val t = a.get("txn")
          val app = t.get("appId").asText()
          val v = t.get("version").asLong()
          if (txns.getOrElse(app, Long.MinValue) < v) txns(app) = v
        }
        if (a.has("commitInfo")) {
          val ci = a.get("commitInfo")
          // inCommitTimestamp (the inCommitTimestamp writer feature) is
          // the authoritative, monotonic commit time when present —
          // modern writers make file modification times meaningless
          if (ci.has("inCommitTimestamp"))
            stamps(v) = ci.get("inCommitTimestamp").asLong()
          else if (ci.has("timestamp"))
            stamps(v) = ci.get("timestamp").asLong()
        }
      }
      commitRemoves.filterNot(commitAdds.contains).foreach(live.remove)
      commitAdds.foreach { case (p, a) => live(p) = a }
      if (!stamps.contains(v))
        stamps(v) = f.getFileStatus(new Path(log, f"$v%020d.json"))
          .getModificationTime
    }
    require(schema != null,
      s"Delta log has no metaData action at or below version $target: $dir")
    Snapshot(target, schema, partCols, live.values.toSeq, stamps.toMap,
      txns.toMap, mappingMode, proto._1, proto._2, proto._3, proto._4)
  }

  /** Refuse tables whose reader features this implementation does not
    * honor — silently mis-reading (ignoring deletion vectors, resolving
    * mapped column names wrong) is worse than failing.
    */
  private def gateProtocol(mrv: Int, feats: Seq[String]): Unit = {
    val unsupported = feats.filterNot(Set(
      "timestampNtz", "vacuumProtocolCheck", "deletionVectors",
      "columnMapping", "v2Checkpoint"))
    require(mrv <= 2 || (mrv == 3 && unsupported.isEmpty),
      s"Delta reader version $mrv with features " +
        s"[${unsupported.mkString(", ")}] not supported; " +
        "rewrite the table without these features first")
  }

  private def strList(n: JsonNode): Seq[String] =
    Option(n).filterNot(_.isNull).toSeq
      .flatMap(_.elements().asScala.map(_.asText()))

  private def parseDv(action: JsonNode): Option[DeltaDv.Descriptor] =
    Option(action.get("deletionVector")).filterNot(_.isNull).map { d =>
      DeltaDv.Descriptor(d.get("storageType").asText(),
        d.get("pathOrInlineDv").asText(),
        Option(d.get("offset")).filterNot(_.isNull).map(_.asLong()),
        d.get("sizeInBytes").asInt(), d.get("cardinality").asLong())
    }

  private def partValues(node: JsonNode): Map[String, String] =
    if (node == null) Map.empty
    else node.properties().asScala
      .map(e => e.getKey -> (if (e.getValue.isNull) null
        else e.getValue.asText())).toMap

  /** Resolve `datetime` (ISO-8601) to the newest version whose commit
    * timestamp is at or before it (delta.md: "based on the server time
    * recorded in the transaction log").
    */
  def versionAt(spark: SparkSession, dir: String, datetime: String): Long = {
    val snap = reconstruct(spark, dir, None)
    val cut = java.time.OffsetDateTime.parse(datetime).toInstant.toEpochMilli
    val eligible = snap.timestamps.filter(_._2 <= cut).keys
    require(eligible.nonEmpty,
      s"no Delta commit at or before $datetime in $dir")
    eligible.max
  }

  /** Physical field name under column mapping (name/id modes both write
    * `delta.columnMapping.physicalName` into the field metadata; id-mode
    * parquet files also carry field ids, but they store the same
    * physical names, so name resolution covers both).
    */
  private def physName(f: StructField): String =
    if (f.metadata.contains("delta.columnMapping.physicalName"))
      f.metadata.getString("delta.columnMapping.physicalName")
    else f.name

  /** Recursively rename a logical type to its physical (on-disk) form. */
  private def physType(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      StructField(physName(f), physType(f.dataType), f.nullable)))
    case ArrayType(et, n) => ArrayType(physType(et), n)
    case MapType(k, v, n) => MapType(physType(k), physType(v), n)
    case other => other
  }

  /** Read the rows added by exactly one data file set, with partition
    * columns attached as literals, the files' deletion vectors applied,
    * and (under column mapping) physical names resolved back to the
    * declared logical schema. `files` must share one partitionValues
    * tuple.
    */
  private def readGroup(spark: SparkSession, dir: String,
      snap: Snapshot, files: Seq[AddFile],
      keepPos: Boolean = false): DataFrame = {
    val mapped = snap.columnMappingMode != "none"
    val dataFields = snap.schema.fields
      .filterNot(f => snap.partitionColumns.contains(f.name))
    val readSchema =
      if (mapped) StructType(dataFields.map(f =>
        StructField(physName(f), physType(f.dataType), f.nullable)))
      else StructType(dataFields)
    val (withDv, plain) = files.partition(_.dv.exists(_.cardinality > 0))
    val needPos = keepPos || withDv.nonEmpty
    // physical row addressing: file basename (UUID-unique within a
    // table) + row_index from the parquet scan's metadata column
    def scan(fs0: Seq[AddFile]): DataFrame = {
      val d = spark.read.schema(readSchema)
        .parquet(fs0.map(a => new Path(dir,
          java.net.URLDecoder.decode(a.path, "UTF-8")).toString): _*)
      if (!needPos) d
      else d.withColumn("__file", element_at(
          split(col("_metadata.file_path"), "/"), -1))
        .withColumn("__idx", col("_metadata.row_index"))
    }
    val base0 =
      if (withDv.isEmpty) scan(files)
      else {
        // deleted rows are addressed by physical position within their
        // parquet file: drop deleted positions via ONE broadcast
        // anti-join on (file basename, row index) — exchange-free, and
        // the broadcast side is the DV cardinality, not the data
        val (fsys, rootP) = fs(spark, dir)
        val pairs = withDv.flatMap { a =>
          val name = new Path(
            java.net.URLDecoder.decode(a.path, "UTF-8")).getName
          DeltaDv.readIndices(fsys, rootP, a.dv.get).map(i => (name, i))
        }
        import spark.implicits._
        val deleted = pairs.toDF("__dv_file", "__dv_idx")
        val dvScan = scan(withDv)
          .join(broadcast(deleted),
            col("__file") === col("__dv_file") &&
              col("__idx") === col("__dv_idx"), "left_anti")
        if (plain.isEmpty) dvScan else scan(plain).unionAll(dvScan)
      }
    val base = if (needPos && !keepPos) base0.drop("__file", "__idx")
      else base0
    val posCols = if (keepPos) Seq(col("__file"), col("__idx")) else Nil
    // logical names: a positional struct cast renames nested physical
    // fields back to the declared ones in one codegen'd projection
    val logical =
      if (!mapped) base
      else base.select(dataFields.map(f =>
        col(physName(f)).cast(f.dataType).as(f.name)).toSeq ++ posCols: _*)
    val pv = files.head.partitionValues
    val withParts = snap.partitionColumns.foldLeft(logical) { (df, c) =>
      val f = snap.schema(c)
      val key = if (mapped) physName(f) else c
      df.withColumn(c, lit(pv.getOrElse(key, null)).cast(f.dataType))
    }
    // restore declared column order
    withParts.select(snap.schema.fieldNames.map(col).toSeq ++ posCols: _*)
  }

  /** The full content of a file set as one DataFrame (union of
    * per-partition-tuple scans; empty-table safe).
    */
  private def readFiles(spark: SparkSession, dir: String, snap: Snapshot,
      files: Seq[AddFile]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    else files.groupBy(_.partitionValues).values.toSeq
      .map(g => readGroup(spark, dir, snap, g))
      .reduce(_.unionAll(_))

  /** Snapshot read: the table's rows at `version` / `datetime` (latest
    * when neither is set), with optional `filter` and `snapshot_filter`
    * predicates (both are plain SQL boolean expressions; predicates over
    * partition columns prune branches at plan time).
    */
  def snapshot(spark: SparkSession, dir: String,
      version: Option[Long] = None, datetime: Option[String] = None,
      filter: Option[String] = None,
      snapshotFilter: Option[String] = None): DataFrame = {
    require(version.isEmpty || datetime.isEmpty,
      "at most one of version and datetime can be specified")
    val v = version.orElse(datetime.map(versionAt(spark, dir, _)))
    val snap = reconstruct(spark, dir, v)
    val df = readFiles(spark, dir, snap, snap.files)
    Seq(filter, snapshotFilter).flatten.foldLeft(df)((d, p) => d.where(expr(p)))
  }

  /** Follow the log after `startVersion` up to `endVersion` (inclusive):
    * each commit's added files contribute +1 rows and removed files −1
    * rows — a Z-set delta stream, the connector's `follow` mode. Removed
    * files are re-read for their content (they remain on storage until
    * VACUUM; the same contract the reference's follow mode relies on).
    */
  def changes(spark: SparkSession, dir: String, startVersion: Long,
      endVersion: Option[Long] = None,
      filter: Option[String] = None): DataFrame = {
    val (f, _) = fs(spark, dir)
    val log = logDir(dir)
    val snap = reconstruct(spark, dir, None)
    val vs = commitVersions(f, log)
      .filter(v => v > startVersion && endVersion.forall(v <= _))
    val deltas = vs.flatMap { v =>
      val in = f.open(new Path(log, f"$v%020d.json"))
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toVector finally in.close()
      val adds = scala.collection.mutable.ArrayBuffer[AddFile]()
      val removes = scala.collection.mutable.ArrayBuffer[AddFile]()
      lines.foreach { line =>
        val a = mapper.readTree(line)
        if (a.has("add")) {
          val ad = a.get("add")
          adds += AddFile(ad.get("path").asText(),
            partValues(ad.get("partitionValues")),
            Option(ad.get("size")).map(_.asLong()).getOrElse(0L),
            parseDv(ad))
        }
        if (a.has("remove")) {
          // a DML that only grows a file's DV re-adds the path with the
          // new vector and removes it with the old one: add − remove
          // nets to a retraction of exactly the newly-deleted rows
          val rm = a.get("remove")
          removes += AddFile(rm.get("path").asText(),
            partValues(rm.get("partitionValues")), 0L, parseDv(rm))
        }
      }
      Seq(ZSets.lift(readFiles(spark, dir, snap, adds.toSeq))) ++
        (if (removes.isEmpty) Nil
         else Seq(ZSets.negate(ZSets.lift(
           readFiles(spark, dir, snap, removes.toSeq)))))
    }
    val all =
      if (deltas.isEmpty)
        ZSets.lift(readFiles(spark, dir, snap, Seq.empty))
      else deltas.reduce(_.unionAll(_))
    filter.foldLeft(all)((d, p) => d.where(expr(p)))
  }

  /** CDC mode (delta.md `mode = cdc`): the table is an append-only log of
    * actions; only `add` files after `startVersion` are read (removes are
    * log cleanup, ignored). `deleteFilter` marks deletion events (weight
    * −1); `orderBy` — required for PK tables — must be castable to BIGINT
    * and lands in `_seq` so upsert ingestion applies last-write-wins in
    * update order WITHOUT a global sort (the reference requires a totally
    * ordered column here for the same reason).
    */
  def cdc(spark: SparkSession, dir: String, startVersion: Long,
      deleteFilter: Option[String], orderBy: Option[String],
      endVersion: Option[Long] = None,
      filter: Option[String] = None): DataFrame = {
    val (f, _) = fs(spark, dir)
    val log = logDir(dir)
    val snap = reconstruct(spark, dir, None)
    val vs = commitVersions(f, log)
      .filter(v => v > startVersion && endVersion.forall(v <= _))
    val adds = vs.flatMap { v =>
      val in = f.open(new Path(log, f"$v%020d.json"))
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toVector finally in.close()
      lines.flatMap { line =>
        val a = mapper.readTree(line)
        if (a.has("add")) {
          val ad = a.get("add")
          Some(AddFile(ad.get("path").asText(),
            partValues(ad.get("partitionValues")),
            Option(ad.get("size")).map(_.asLong()).getOrElse(0L),
            parseDv(ad)))
        } else None
      }
    }
    val rows = readFiles(spark, dir, snap, adds)
    val filtered = filter.foldLeft(rows)((d, p) => d.where(expr(p)))
    val weighted = deleteFilter match {
      case Some(p) => filtered.withColumn(ZSets.W,
        when(expr(p), lit(-1L)).otherwise(lit(1L)))
      case None => ZSets.lift(filtered)
    }
    orderBy match {
      case Some(o) => weighted.withColumn("_seq", expr(o).cast("long"))
      case None => weighted
    }
  }

  // ------------------------------------------------------------------
  // Writer
  // ------------------------------------------------------------------

  /** Append `df` to the Delta table at `dir` as one commit; creates the
    * table (protocol + metaData actions) on first write. Returns the
    * committed version. Data lands as ordinary distributed parquet part
    * files; only the commit JSON is written driver-side, atomically
    * (create-no-overwrite — a concurrent committer loses and retries,
    * the protocol's optimistic concurrency rule).
    */
  /** Stage `df` as parquet part files (hive-partitioned when
    * `partitionBy` is set), move them into the table root under unique
    * version-stamped names, and return their add entries — the shared
    * two-phase write behind append/delete/compaction.
    */
  private def stageWrite(f: FileSystem, root: Path, df: DataFrame,
      partitionBy: Seq[String], version: Long): Seq[AddFile] = {
    val stage = new Path(root, s".stage-${java.util.UUID.randomUUID()}")
    val writer = if (partitionBy.nonEmpty)
      df.write.partitionBy(partitionBy: _*) else df.write
    writer.parquet(stage.toString)
    def dataFiles(p: Path): Seq[Path] =
      f.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) dataFiles(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
        else Seq.empty
      }
    val parts = dataFiles(stage)
    val stageUri = f.makeQualified(stage).toUri
    val adds = parts.map { p =>
      // partition values from the hive-style staged path
      val rel = stageUri.relativize(f.makeQualified(p).toUri).getPath
      val pv = rel.split('/').dropRight(1).flatMap(_.split('=') match {
        case Array(k, v) => Some(k ->
          (if (v == "__HIVE_DEFAULT_PARTITION__") null
           else java.net.URLDecoder.decode(v, "UTF-8")))
        case _ => None
      }).toMap
      val name = s"part-$version-${java.util.UUID.randomUUID()}.parquet"
      val sub = rel.split('/').dropRight(1).mkString("/")
      val destDir = if (sub.isEmpty) root else new Path(root, sub)
      f.mkdirs(destDir)
      val dest = new Path(destDir, name)
      require(f.rename(p, dest), s"stage move failed: $p -> $dest")
      val relPath = (if (sub.isEmpty) name else s"$sub/$name")
      AddFile(relPath, pv, f.getFileStatus(dest).getLen)
    }
    f.delete(stage, true)
    adds
  }

  private def addActionJson(a: AddFile, now: Long,
      dataChange: Boolean): String = {
    val pvJson = a.partitionValues.toSeq.sortBy(_._1).map { case (k, v) =>
      mapper.writeValueAsString(k) + ":" +
        (if (v == null) "null" else mapper.writeValueAsString(v))
    }.mkString("{", ",", "}")
    val dvJson = a.dv.map(d =>
      s""","deletionVector":${DeltaDv.descriptorJson(d)}""").getOrElse("")
    s"""{"add":{"path":"${a.path}","partitionValues":$pvJson,""" +
      s""""size":${a.size},"modificationTime":$now,""" +
      s""""dataChange":$dataChange$dvJson}}"""
  }

  def append(spark: SparkSession, dir: String, df: DataFrame,
      partitionBy: Seq[String] = Seq.empty,
      txn: Option[(String, Long)] = None): Long = {
    val (f, root) = fs(spark, dir)
    val log = logDir(dir)
    f.mkdirs(log)
    val existing = commitVersions(f, log)
    val version = if (existing.isEmpty) 0L else existing.max + 1
    val adds = stageWrite(f, root, df, partitionBy, version)

    val actions = scala.collection.mutable.ArrayBuffer[String]()
    val now = System.currentTimeMillis()
    if (version == 0L) {
      actions += s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
      val schemaJson = mapper.writeValueAsString(
        StructType(df.schema.fields.map(_.copy(nullable = true))).json)
      actions += s"""{"metaData":{"id":"${java.util.UUID.randomUUID()}",""" +
        s""""format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":$schemaJson,""" +
        s""""partitionColumns":${partitionBy.map(p =>
          "\"" + p + "\"").mkString("[", ",", "]")},""" +
        s""""configuration":{},"createdTime":$now}}"""
    }
    txn.foreach { case (app, v) =>
      actions += s"""{"txn":{"appId":${mapper.writeValueAsString(app)},""" +
        s""""version":$v,"lastUpdated":$now}}"""
    }
    adds.foreach(a => actions += addActionJson(a, now, dataChange = true))
    actions += s"""{"commitInfo":{"timestamp":$now,"operation":"WRITE"}}"""

    val commit = new Path(log, f"$version%020d.json")
    val out = f.create(commit, /* overwrite = */ false)
    try out.write((actions.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    version
  }

  /** Remove rows matching `pred` from the table: rewrite affected files
    * (add survivors, remove originals) as one commit. A demo-grade DELETE
    * for tests and the `follow` mode's retraction path; the production
    * path at scale is the sink's change-log form below.
    */
  def deleteWhere(spark: SparkSession, dir: String, pred: String): Long = {
    val (f, root) = fs(spark, dir)
    val snap = reconstruct(spark, dir, None)
    // files whose content matches the predicate — ONE distributed scan
    // (input_file_name aggregation), not a probe job per file
    val hitFiles = readFiles(spark, dir, snap, snap.files)
      .where(expr(pred)).select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    def norm(s: String): String = java.net.URLDecoder.decode(
      s.stripPrefix("file:"), "UTF-8")
    val affected = snap.files.filter { a =>
      val full = norm(new Path(dir,
        java.net.URLDecoder.decode(a.path, "UTF-8")).toString)
      hitFiles.exists(h => norm(h).endsWith(full))
    }
    if (affected.isEmpty) return snap.version
    val survivors = readFiles(spark, dir, snap, affected)
      .where(not(expr(pred)))
    val version = snap.version + 1
    val now = System.currentTimeMillis()
    // rewrite WITH the table's partitioning, or a partitioned table's
    // survivors would land with empty partitionValues and read as null
    val adds = stageWrite(f, root, survivors, snap.partitionColumns, version)
    val actions =
      adds.map(a => addActionJson(a, now, dataChange = true)) ++
      affected.map(a =>
        s"""{"remove":{"path":"${a.path}","deletionTimestamp":$now,""" +
          s""""dataChange":true}}""") ++
      Seq(s"""{"commitInfo":{"timestamp":$now,"operation":"DELETE"}}""")
    val out = f.create(new Path(logDir(dir), f"$version%020d.json"), false)
    try out.write((actions.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    version
  }

  /** DELETE via deletion vectors — the modern writer's fast path: no
    * data file is rewritten; each affected file is re-added with a
    * sidecar bitmap marking the newly-deleted physical positions
    * (merged with any existing vector) and removed with its old one.
    * Write cost is O(deleted positions), independent of file sizes —
    * the property that makes row-level DML tractable on 100-TB tables.
    */
  def deleteWhereDv(spark: SparkSession, dir: String, pred: String): Long = {
    val (f, root) = fs(spark, dir)
    val snap = reconstruct(spark, dir, None)
    if (snap.files.isEmpty) return snap.version
    // (file basename, physical row index) of surviving rows matching
    // the predicate — ONE distributed scan; collected set is bounded
    // by the deleted-row count
    val hits = snap.files.groupBy(_.partitionValues).values.toSeq
      .map(g => readGroup(spark, dir, snap, g, keepPos = true))
      .reduce(_.unionAll(_))
      .where(expr(pred))
      .groupBy("__file").agg(collect_list("__idx").as("idxs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    if (hits.isEmpty) return snap.version
    val now = System.currentTimeMillis()
    val version = snap.version + 1
    val actions = scala.collection.mutable.ArrayBuffer[String]()
    // reader/writer feature declaration (idempotent to repeat)
    actions += """{"protocol":{"minReaderVersion":3,""" +
      """"minWriterVersion":7,"readerFeatures":["deletionVectors"],""" +
      """"writerFeatures":["deletionVectors"]}}"""
    snap.files.foreach { a =>
      val base = new Path(
        java.net.URLDecoder.decode(a.path, "UTF-8")).getName
      hits.get(base).foreach { newIdxs =>
        val old = a.dv.map(d => DeltaDv.readIndices(f, root, d))
          .getOrElse(Array.empty[Long])
        val dv = DeltaDv.writeSidecar(f, root,
          (old ++ newIdxs).distinct.sorted)
        actions += addActionJson(a.copy(dv = Some(dv)), now,
          dataChange = true)
        actions += s"""{"remove":{"path":"${a.path}",""" +
          s""""deletionTimestamp":$now,"dataChange":true}}"""
      }
    }
    actions += s"""{"commitInfo":{"timestamp":$now,"operation":"DELETE"}}"""
    val out = f.create(new Path(logDir(dir), f"$version%020d.json"), false)
    try out.write((actions.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    version
  }

  /** OPTIMIZE-style file compaction: rewrite the current snapshot's
    * files into at most `targetFiles` larger ones as a single
    * add/remove commit (dataChange=false semantics: content identical).
    * Bounds small-file fan-out from frequent micro-batch appends — the
    * table-maintenance sibling of log [[checkpoint]]s.
    */
  def compactFiles(spark: SparkSession, dir: String,
      targetFiles: Int = 1): Long = {
    val (f, root) = fs(spark, dir)
    val snap = reconstruct(spark, dir, None)
    if (snap.files.size <= targetFiles) return snap.version
    val version = snap.version + 1
    val now = System.currentTimeMillis()
    val adds = stageWrite(f, root,
      readFiles(spark, dir, snap, snap.files).repartition(targetFiles),
      snap.partitionColumns, version)
    val actions =
      adds.map(a => addActionJson(a, now, dataChange = false)) ++
      snap.files.map(a =>
        s"""{"remove":{"path":"${a.path}","deletionTimestamp":$now,""" +
          s""""dataChange":false}}""") ++
      Seq(s"""{"commitInfo":{"timestamp":$now,"operation":"OPTIMIZE"}}""")
    val out = f.create(new Path(logDir(dir), f"$version%020d.json"), false)
    try out.write((actions.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    version
  }

  /** VACUUM: physically delete data files no longer referenced by the
    * current snapshot and older than `retainMillis`. After a vacuum,
    * `follow` reads that need a removed file's CONTENT fail (the same
    * contract the reference documents: keep retention ≥ the longest
    * follower lag). Returns the number of files deleted.
    */
  def vacuum(spark: SparkSession, dir: String,
      retainMillis: Long = 7L * 24 * 3600 * 1000): Int = {
    val (f, root) = fs(spark, dir)
    val snap = reconstruct(spark, dir, None)
    val qRoot0 = f.makeQualified(root).toUri
    val live = snap.files
      .map(a => java.net.URLDecoder.decode(a.path, "UTF-8")).toSet ++
      // deletion-vector sidecars referenced by live files stay
      snap.files.flatMap(_.dv).filter(_.storageType == "u").map(d =>
        qRoot0.relativize(f.makeQualified(
          DeltaDv.sidecarPath(root, d)).toUri).getPath)
    val cutoff = System.currentTimeMillis() - retainMillis
    def walk(p: Path): Seq[Path] =
      f.listStatus(p).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (name == "_delta_log" || name.startsWith(".stage-")) Seq.empty
        else if (st.isDirectory) walk(st.getPath)
        else Seq(st.getPath)
      }
    val qRoot = f.makeQualified(root).toUri
    val victims = walk(root).filter { p =>
      val rel = qRoot.relativize(f.makeQualified(p).toUri).getPath
      !live.contains(rel) && f.getFileStatus(p).getModificationTime < cutoff
    }
    victims.foreach(f.delete(_, false))
    victims.size
  }

  /** Write a parquet checkpoint of the state at the latest version and
    * point `_last_checkpoint` at it — the log-compaction step that bounds
    * replay cost (and lets old JSON commits be cleaned up).
    */
  // checkpoint action struct schemas + row builders, shared by the
  // classic and V2 writers — ONE definition of the on-disk action shape
  private val ckptDvType = StructType(Seq(
    StructField("storageType", StringType),
    StructField("pathOrInlineDv", StringType),
    StructField("offset", LongType),
    StructField("sizeInBytes", LongType),
    StructField("cardinality", LongType)))
  private val ckptAddType = StructType(Seq(
    StructField("path", StringType),
    StructField("partitionValues", MapType(StringType, StringType)),
    StructField("size", LongType),
    StructField("deletionVector", ckptDvType)))
  private val ckptMetaType = StructType(Seq(
    StructField("schemaString", StringType),
    StructField("partitionColumns", ArrayType(StringType)),
    StructField("configuration", MapType(StringType, StringType))))
  private val ckptTxnType = StructType(Seq(
    StructField("appId", StringType), StructField("version", LongType)))
  private val ckptProtoType = StructType(Seq(
    StructField("minReaderVersion", IntegerType),
    StructField("minWriterVersion", IntegerType),
    StructField("readerFeatures", ArrayType(StringType)),
    StructField("writerFeatures", ArrayType(StringType))))

  private def ckptProtoRow(s: Snapshot): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row(s.minReaderVersion, s.minWriterVersion,
      if (s.readerFeatures.isEmpty) null else s.readerFeatures,
      if (s.writerFeatures.isEmpty) null else s.writerFeatures)

  private def ckptMetaRow(s: Snapshot): org.apache.spark.sql.Row = {
    val conf0 =
      if (s.columnMappingMode == "none") Map.empty[String, String]
      else Map("delta.columnMapping.mode" -> s.columnMappingMode)
    org.apache.spark.sql.Row(s.schema.json, s.partitionColumns, conf0)
  }

  private def ckptAddRow(a: AddFile): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row(a.path, a.partitionValues, a.size,
      a.dv.map(d => org.apache.spark.sql.Row(d.storageType,
        d.pathOrInlineDv, d.offset.map(Long.box).orNull,
        d.sizeInBytes.toLong, d.cardinality)).orNull)

  /** Write `df` as ONE parquet file under a temp dir in `log`; return
    * the part file (caller renames it into place).
    */
  private def stageOneParquet(spark: SparkSession, f: FileSystem,
      log: Path, df: DataFrame, tmp: String): Path = {
    df.repartition(1).write.mode("overwrite")
      .parquet(new Path(log, tmp).toString)
    f.listStatus(new Path(log, tmp)).toSeq
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
  }

  def checkpoint(spark: SparkSession, dir: String): Long = {
    import org.apache.spark.sql.Row
    val (f, _) = fs(spark, dir)
    val snap = reconstruct(spark, dir, None)
    val ckptSchema = StructType(Seq(
      StructField("add", ckptAddType), StructField("metaData", ckptMetaType),
      StructField("txn", ckptTxnType),
      StructField("protocol", ckptProtoType)))
    // a checkpoint must carry the protocol and metaData actions — the
    // commits that declared them may be cleaned up afterwards
    val rows =
      Row(null, null, null, ckptProtoRow(snap)) +:
      Row(null, ckptMetaRow(snap), null, null) +:
      (snap.txns.toSeq.sortBy(_._1).map { case (app, v) =>
        Row(null, null, Row(app, v), null) } ++
       snap.files.map(a => Row(ckptAddRow(a), null, null, null)))
    val log = logDir(dir)
    val part = stageOneParquet(spark, f, log,
      spark.createDataFrame(rows.asJava, ckptSchema), ".ckpt-tmp")
    val dest = new Path(log, f"${snap.version}%020d.checkpoint.parquet")
    f.delete(dest, false)
    require(f.rename(part, dest), "checkpoint move failed")
    f.delete(new Path(log, ".ckpt-tmp"), true)
    val out = f.create(new Path(log, "_last_checkpoint"), true)
    try out.write(
      s"""{"version":${snap.version},"size":${snap.files.size + 2}}"""
        .getBytes("UTF-8"))
    finally out.close()
    snap.version
  }

  /** Write a V2 checkpoint of the state at the latest version: a
    * UUID-named parquet MANIFEST (`n.checkpoint.<uuid>.parquet`) holding
    * the non-file actions (`checkpointMetadata`, `metaData`, `txn`) plus
    * `sidecar` references, with the file actions in a sidecar parquet
    * under `_delta_log/_sidecars/` — the layout modern writers produce
    * once the `v2Checkpoint` table feature is enabled (delta-io
    * PROTOCOL.md "V2 spec"). Functionally equivalent to [[checkpoint]];
    * exists so round trips prove the reader against both layouts.
    */
  def checkpointV2(spark: SparkSession, dir: String): Long = {
    import org.apache.spark.sql.Row
    val (f, _) = fs(spark, dir)
    val snap = reconstruct(spark, dir, None)
    val log = logDir(dir)
    // sidecar: the file actions only
    val addRows = snap.files.map(a => Row(ckptAddRow(a)))
    val scPart = stageOneParquet(spark, f, log,
      spark.createDataFrame(addRows.asJava,
        StructType(Seq(StructField("add", ckptAddType)))), ".ckpt-sc-tmp")
    val scName = java.util.UUID.randomUUID().toString + ".parquet"
    val scDir = new Path(log, "_sidecars")
    f.mkdirs(scDir)
    val scDest = new Path(scDir, scName)
    require(f.rename(scPart, scDest), "sidecar move failed")
    f.delete(new Path(log, ".ckpt-sc-tmp"), true)
    val scLen = f.getFileStatus(scDest).getLen
    // manifest: checkpointMetadata + protocol + metaData + txn + the
    // sidecar ref — the checkpoint must carry protocol/metaData, the
    // commits that declared them may be cleaned up afterwards
    val ckptMetadataActionType =
      StructType(Seq(StructField("version", LongType)))
    val sidecarType = StructType(Seq(
      StructField("path", StringType),
      StructField("sizeInBytes", LongType),
      StructField("modificationTime", LongType)))
    val manSchema = StructType(Seq(
      StructField("checkpointMetadata", ckptMetadataActionType),
      StructField("protocol", ckptProtoType),
      StructField("metaData", ckptMetaType),
      StructField("txn", ckptTxnType),
      StructField("sidecar", sidecarType)))
    val manRows =
      Row(Row(snap.version), null, null, null, null) +:
      Row(null, ckptProtoRow(snap), null, null, null) +:
      Row(null, null, ckptMetaRow(snap), null, null) +:
      (snap.txns.toSeq.sortBy(_._1).map { case (app, v) =>
        Row(null, null, null, Row(app, v), null) } :+
       Row(null, null, null, null,
         Row(scName, scLen, System.currentTimeMillis())))
    val manPart = stageOneParquet(spark, f, log,
      spark.createDataFrame(manRows.asJava, manSchema), ".ckpt-man-tmp")
    val dest = new Path(log, f"${snap.version}%020d.checkpoint." +
      java.util.UUID.randomUUID().toString + ".parquet")
    require(f.rename(manPart, dest), "checkpoint manifest move failed")
    f.delete(new Path(log, ".ckpt-man-tmp"), true)
    val out = f.create(new Path(log, "_last_checkpoint"), true)
    try out.write(
      s"""{"version":${snap.version},"size":${snap.files.size + 3}}"""
        .getBytes("UTF-8"))
    finally out.close()
    snap.version
  }

  /** Sink form (docs/connectors/sinks/delta.md): a view output delta
    * lands as an append of change-log records with the documented
    * metadata columns — `__feldera_op` (`i` insert / `d` delete; weight
    * sign) and `__feldera_ts` (monotone update stamp establishing apply
    * order). |w| > 1 rows expand to that many records, matching the wire
    * semantics of one record per multiset element.
    */
  def writeDelta(spark: SparkSession, dir: String, delta: DataFrame,
      ts: Long, txn: Option[(String, Long)] = None): Long = {
    require(delta.columns.contains(ZSets.W),
      "delta sink expects a Z-set delta (weight column)")
    // idempotent retries (the protocol's txn action): a (appId, version)
    // already in the log means this delta landed — skip, exactly-once
    txn.foreach { case (app, v) =>
      val (f0, _) = fs(spark, dir)
      if (f0.exists(logDir(dir))) {
        val cur = reconstruct(spark, dir, None)
        if (cur.txns.getOrElse(app, Long.MinValue) >= v) return cur.version
      }
    }
    val dataCols = ZSets.dataCols(delta).map(col)
    val expanded = delta
      .withColumn("__feldera_op",
        when(col(ZSets.W) < 0, lit("d")).otherwise(lit("i")))
      .withColumn("__feldera_ts", lit(ts))
      .withColumn("_n", explode(sequence(lit(1L), abs(col(ZSets.W)))))
      .select(dataCols :+ col("__feldera_op") :+ col("__feldera_ts"): _*)
    append(spark, dir, expanded, txn = txn)
  }

  /** Reconstruct the current table contents from a change-log table
    * written by [[writeDelta]] — the MERGE job the sink docs prescribe,
    * expressed as a Z-set integration (Σ signed weights > 0 keeps the
    * row).
    */
  def integrateChangeLog(log: DataFrame): DataFrame = {
    val dataCols = log.columns.toSeq
      .filterNot(Set("__feldera_op", "__feldera_ts"))
    ZSets.positive(ZSets.consolidate(
      log.withColumn(ZSets.W,
        when(col("__feldera_op") === "d", lit(-1L)).otherwise(lit(1L)))
        .select(dataCols.map(col) :+ col(ZSets.W): _*)))
  }
}
