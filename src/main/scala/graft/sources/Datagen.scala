package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ddl.Ddl

/** The reference's datagen transport (docs/connectors/sources/datagen.md;
  * crates/adapters/src/transport/datagen/): a plan of row batches with
  * per-field generation settings — `strategy` (increment / uniform /
  * zipf / fake-string families), `range`, `values`, `scale`,
  * `null_percentage`, zipf exponent `e`.
  *
  * Everything generates as a PURE COLUMN PLAN over `spark.range`:
  * deterministic (uniform draws come from xxhash64(field, row), not an
  * RNG), partition/retry-independent, and codegen'd — a 10^12-row plan
  * is just a bigger range, no driver-side row loop anywhere. `workers`
  * maps to the range's parallelism; `rate` is a continuous-clock
  * throttle the reference applies while streaming — a batch read ingests
  * the full plan, so it is accepted and ignored here.
  *
  * Zipf uses the standard continuous inverse-CDF form
  * x = (1 + u·(N^(1−e) − 1))^(1/(1−e)) (bounded-support power law — the
  * same approximation the reference's `rand_distr` zipf sampler is built
  * on).
  */
object Datagen {

  private val mapper = new ObjectMapper()

  /** Generate the table's rows from a connector config. Recognized
    * config keys: `plan` (JSON list), `workers`, `seed`, and the legacy
    * `rows` shorthand (= one increment-everything plan entry, the doc's
    * no-config default shape).
    */
  def generate(spark: SparkSession, table: Ddl.TableDef,
      config: Map[String, String]): DataFrame = {
    val workers = config.get("workers").map(_.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    val seed = config.getOrElse("seed", "42")
    val planJson = config.get("plan")
    val entries: Seq[(Long, JsonNode)] = planJson match {
      case None =>
        Seq((config.getOrElse("rows", "1000").toLong,
          mapper.createObjectNode()))
      case Some(p) =>
        val root = mapper.readTree(p)
        require(root.isArray, "datagen plan must be a JSON array")
        root.elements().asScala.map { e =>
          (Option(e.get("limit")).map(_.asLong()).getOrElse(
            sys.error("datagen: a batch read needs `limit` on every " +
              "plan entry (an unbounded plan only makes sense streaming)")),
            e)
        }.toSeq
    }
    val frames = entries.zipWithIndex.map { case ((limit, entry), pi) =>
      val fieldsNode = Option(entry.get("fields"))
      val base = spark.range(0, limit, 1, workers)
      val cols = table.columns.map { c =>
        val cfg = fieldsNode.flatMap(f => Option(f.get(c.name)))
        fieldCol(c.name, graft.types.SqlTypes.toSpark(c.sqlType), cfg,
          s"$seed/$pi", col("id")).as(c.name)
      }
      base.select(cols: _*)
    }
    frames.reduce(_.unionAll(_))
  }

  /** STREAMING datagen: the same field generators over Spark's `rate`
    * source — `rate` rows/second (the reference's global plan throttle),
    * row ids monotone from 0, so a streamed table equals the batch plan's
    * prefix at every point. Plans with multiple entries concatenate by
    * id offset: a row id in [Σ earlier limits, Σ limits) takes entry i's
    * field settings; an entry without `limit` must be last (it runs
    * forever). Use with `FileSource`-style foreachBatch ingest or any
    * writeStream sink.
    */
  def stream(spark: SparkSession, table: Ddl.TableDef,
      config: Map[String, String]): DataFrame = {
    val rate = config.getOrElse("rate", "1000").toInt
    val seed = config.getOrElse("seed", "42")
    val entries: Seq[(Option[Long], JsonNode)] = config.get("plan") match {
      case None => Seq((config.get("rows").map(_.toLong),
        mapper.createObjectNode()))
      case Some(p) =>
        val root = mapper.readTree(p)
        require(root.isArray, "datagen plan must be a JSON array")
        val es = root.elements().asScala.map(e =>
          (Option(e.get("limit")).map(_.asLong()), e)).toSeq
        es.dropRight(1).zipWithIndex.foreach { case ((lim, _), i) =>
          require(lim.isDefined,
            s"datagen plan entry $i: only the LAST entry may omit limit") }
        es
    }
    val base = spark.readStream.format("rate")
      .option("rowsPerSecond", rate).load()
      .select(col("value").as("id"))
    // per-entry columns selected by id window, offset back to entry-local
    val offsets = entries.scanLeft(0L) { case (acc, (lim, _)) =>
      acc + lim.getOrElse(Long.MaxValue - acc) }
    val cols = table.columns.map { c =>
      val cases = entries.zipWithIndex.map { case ((_, entry), i) =>
        val cfg = Option(entry.get("fields")).flatMap(f =>
          Option(f.get(c.name)))
        val local = fieldCol(c.name,
          graft.types.SqlTypes.toSpark(c.sqlType), cfg, s"$seed/$i",
          col("id") - offsets(i))
        (col("id") >= offsets(i) && col("id") < offsets(i + 1), local)
      }
      cases.tail.foldLeft(when(cases.head._1, cases.head._2)) {
        case (acc, (p, v)) => acc.when(p, v) }.as(c.name)
    }
    // rows past every limit are dropped (a bounded plan just stops)
    base.where(col("id") < offsets.last).select(cols: _*)
  }

  /** Uniform draw in [0, 1) for (field, row) — deterministic, no RNG
    * state, identical on every layout/retry.
    */
  private def u01(tag: String, idc: Column): Column =
    (pmod(xxhash64(lit(tag), idc), lit(1L << 40))
      .cast("double") / lit((1L << 40).toDouble))

  private def strategyOf(cfg: Option[JsonNode]): String =
    cfg.flatMap(c => Option(c.get("strategy"))).map(_.asText())
      .getOrElse("increment")

  private def rangeOf(cfg: Option[JsonNode]): Option[(JsonNode, JsonNode)] =
    cfg.flatMap(c => Option(c.get("range"))).map { r =>
      require(r.isArray && r.size() == 2,
        "datagen range must be [start, end)")
      (r.get(0), r.get(1))
    }

  private def valuesOf(cfg: Option[JsonNode]): Option[Seq[JsonNode]] =
    cfg.flatMap(c => Option(c.get("values")))
      .map(_.elements().asScala.toSeq)

  private def scaleOf(cfg: Option[JsonNode]): Double =
    cfg.flatMap(c => Option(c.get("scale"))).map(_.asDouble()).getOrElse(1d)

  private def nullPct(cfg: Option[JsonNode]): Double =
    cfg.flatMap(c => Option(c.get("null_percentage")))
      .map(_.asDouble()).getOrElse(0d)

  private def zipfE(cfg: Option[JsonNode]): Double =
    cfg.flatMap(c => Option(c.get("e"))).map(_.asDouble()).getOrElse(1.5)

  /** Zipf-distributed index in [0, n): continuous inverse CDF of the
    * bounded power law.
    */
  private def zipfIdx(u: Column, n: Column, e: Double): Column = {
    require(e > 0 && e != 1.0, s"zipf exponent e must be > 0 and != 1, got $e")
    val p = 1.0 - e
    least(n - 1, floor(
      pow(lit(1d) + u * (pow(n.cast("double"), p) - 1d), lit(1.0 / p))
        - 1d).cast("long"))
  }

  private def fieldCol(name: String, dt: DataType, cfg: Option[JsonNode],
      seed: String, id: Column): Column = {
    val strat = strategyOf(cfg)
    val range = rangeOf(cfg)
    val values = valuesOf(cfg)
    val scale = scaleOf(cfg)
    val u = u01(s"$seed/$name", id)

    val core: Column = values match {
      case Some(vs) =>
        require(vs.nonEmpty, s"datagen $name: empty values list")
        val lits = vs.map(v => jsonLit(v, dt))
        val idx = strat match {
          case "increment" => pmod(id, lit(vs.size.toLong))
          case "uniform" => floor(u * vs.size).cast("long")
          case "zipf" => zipfIdx(u, lit(vs.size.toLong), zipfE(cfg))
          case other => sys.error(
            s"datagen $name: strategy $other not valid with values")
        }
        element_at(array(lits: _*), (idx + 1).cast("int"))
      case None => dt match {
        case LongType | IntegerType | ShortType =>
          val (start, end) = range.map(r => (r._1.asLong(), r._2.asLong()))
            .getOrElse((0L, Long.MaxValue))
          require(end > start, s"datagen $name: start >= end")
          val span = end - start
          val raw = strat match {
            case "increment" =>
              pmod((id.cast("double") * scale).cast("long"), lit(span))
            case "uniform" =>
              (floor(u * span * scale).cast("long")) % lit(span)
            case "zipf" => zipfIdx(u, lit(span), zipfE(cfg))
            case other => sys.error(
              s"datagen $name: unknown numeric strategy $other")
          }
          (lit(start) + raw).cast(dt)
        case DoubleType | FloatType =>
          val (start, end) = range.map(r => (r._1.asDouble(), r._2.asDouble()))
            .getOrElse((0d, 1e9))
          require(end > start, s"datagen $name: start >= end")
          val span = end - start
          val raw = strat match {
            case "increment" =>
              pmod(id.cast("double") * scale, lit(span))
            case "uniform" => u * span * scale % span
            case "zipf" =>
              zipfIdx(u, lit(math.max(2L, span.toLong)), zipfE(cfg))
                .cast("double")
            case other => sys.error(
              s"datagen $name: unknown numeric strategy $other")
          }
          (lit(start) + raw).cast(dt)
        case _: DecimalType =>
          fieldCol(name, DoubleType, cfg, seed, id).cast(dt)
        case BooleanType => strat match {
          case "increment" => pmod(id, lit(2L)) === 1
          case _ => u >= 0.5
        }
        case StringType => stringCol(name, strat, range, scale, u, seed, id)
        case TimestampType | TimestampNTZType =>
          // range in RFC-3339 strings or unix millis; increment = 1 ms
          def ms(n: JsonNode): Long =
            if (n.isNumber) n.asLong()
            else java.time.OffsetDateTime.parse(n.asText())
              .toInstant.toEpochMilli
          val (start, end) = range.map(r => (ms(r._1), ms(r._2)))
            .getOrElse((0L, 4102444800000L))
          require(end > start, s"datagen $name: start >= end")
          val span = end - start
          val raw = strat match {
            case "increment" =>
              pmod((id.cast("double") * scale).cast("long"), lit(span))
            case "uniform" => floor(u * span).cast("long")
            case "zipf" => zipfIdx(u, lit(span), zipfE(cfg))
            case other => sys.error(
              s"datagen $name: unknown timestamp strategy $other")
          }
          timestamp_millis(lit(start) + raw).cast(dt)
        case DateType =>
          def days(n: JsonNode): Long =
            if (n.isNumber) n.asLong()
            else java.time.LocalDate.parse(n.asText()).toEpochDay
          val (start, end) = range.map(r => (days(r._1), days(r._2)))
            .getOrElse((0L, 54787L))
          require(end > start, s"datagen $name: start >= end")
          val span = end - start
          val raw = strat match {
            case "increment" =>
              pmod((id.cast("double") * scale).cast("long"), lit(span))
            case "uniform" => floor(u * span).cast("long")
            case "zipf" => zipfIdx(u, lit(span), zipfE(cfg))
            case other => sys.error(
              s"datagen $name: unknown date strategy $other")
          }
          date_add(lit(java.sql.Date.valueOf("1970-01-01")),
            (lit(start) + raw).cast("int"))
        case ArrayType(et, _) =>
          // range = element-count range (default [0,5)); `value` settings
          // apply to elements. sequence(1, 0) DESCENDS in Spark — guard
          // the empty-array case explicitly.
          val (start, end) = range.map(r => (r._1.asLong(), r._2.asLong()))
            .getOrElse((0L, 5L))
          val n = (lit(start) + pmod(id, lit(math.max(1L, end - start))))
            .cast("int")
          val valueCfg = cfg.flatMap(c => Option(c.get("value")))
          when(n <= 0, array().cast(ArrayType(et)))
            .otherwise(transform(sequence(lit(1), n), i =>
              elemCol(name, et, valueCfg, seed, i, id)))
        case other => sys.error(
          s"datagen: type not supported for field $name: $other " +
            "(map/struct/binary fields need explicit values)")
      }
    }
    val np = nullPct(cfg)
    if (np <= 0) core
    else when(u01(s"$seed/$name/null", id) < np / 100.0, lit(null).cast(dt))
      .otherwise(core)
  }

  /** Array-element generator: like the scalar path but indexed by
    * (row, element position) so elements differ within one array.
    */
  private def elemCol(name: String, dt: DataType, cfg: Option[JsonNode],
      seed: String, i: Column, id: Column): Column = {
    val u = (pmod(xxhash64(lit(s"$seed/$name/elem"), id, i),
      lit(1L << 40)).cast("double") / lit((1L << 40).toDouble))
    dt match {
      case LongType | IntegerType =>
        val (start, end) = rangeOf(cfg)
          .map(r => (r._1.asLong(), r._2.asLong()))
          .getOrElse((0L, 1000000L))
        (lit(start) + floor(u * (end - start)).cast("long")).cast(dt)
      case DoubleType | FloatType => (u * 1000).cast(dt)
      case StringType => concat(lit("v"),
        floor(u * 10000).cast("long").cast("string"))
      case other => sys.error(s"datagen: array element type $other " +
        s"not supported for $name")
    }
  }

  private def jsonLit(v: JsonNode, dt: DataType): Column =
    if (v.isNull) lit(null).cast(dt)
    else dt match {
      case StringType => lit(v.asText())
      case LongType | IntegerType | ShortType => lit(v.asLong()).cast(dt)
      case DoubleType | FloatType | (_: DecimalType) =>
        lit(v.asDouble()).cast(dt)
      case BooleanType => lit(v.asBoolean())
      case TimestampType | TimestampNTZType =>
        to_timestamp(lit(v.asText())).cast(dt)
      case DateType => to_date(lit(v.asText()))
      case other => sys.error(s"datagen values: type $other not supported")
    }

  // --- fake-string families (datagen.md "String Generation
  // Strategies"): deterministic picks from small embedded lexicons — the
  // documented semantics is "a plausible value of this kind", not a
  // specific corpus, so a compact wordlist serves every scale.

  private val Words = Seq("lorem", "ipsum", "dolor", "sit", "amet",
    "consectetur", "adipiscing", "elit", "sed", "eiusmod", "tempor",
    "incididunt", "labore", "dolore", "magna", "aliqua", "enim", "minim",
    "veniam", "quis", "nostrud", "exercitation", "ullamco", "laboris",
    "nisi", "aliquip", "commodo", "consequat", "duis", "aute", "irure",
    "reprehenderit")
  private val FirstNames = Seq("Ada", "Alan", "Grace", "Edsger", "Barbara",
    "Donald", "John", "Margaret", "Dennis", "Ken", "Bjarne", "Guido",
    "James", "Anders", "Yukihiro", "Rich")
  private val LastNames = Seq("Lovelace", "Turing", "Hopper", "Dijkstra",
    "Liskov", "Knuth", "McCarthy", "Hamilton", "Ritchie", "Thompson",
    "Stroustrup", "Rossum", "Gosling", "Hejlsberg", "Matsumoto", "Hickey")
  private val DomainSuffixes = Seq("com", "org", "net", "io", "dev", "co")
  private val CityNames = Seq("Springfield", "Riverton", "Fairview",
    "Georgetown", "Ashland", "Clinton", "Madison", "Franklin", "Arlington",
    "Salem", "Bristol", "Dover", "Hudson", "Milton", "Newport", "Oxford")
  private val CountryCodes = Seq("US", "GB", "DE", "FR", "JP", "BR", "IN",
    "CA", "AU", "NL", "SE", "CH", "ES", "IT", "NO", "DK")
  private val StateAbbrs = Seq("AL", "AK", "AZ", "CA", "CO", "CT", "FL",
    "GA", "IL", "MA", "NY", "OH", "OR", "TX", "WA", "WI")

  private def pick(vals: Seq[String], u: Column): Column =
    element_at(array(vals.map(lit): _*),
      (floor(u * vals.size) + 1).cast("int"))

  /** Repeated picks joined by a separator; count from `range` (the doc:
    * words/sentences/paragraphs lengths are range-controlled).
    */
  private def picks(vals: Seq[String], seed: String, n: Column,
      sep: String, id: Column, cap: String = ""): Column = {
    val arr = transform(sequence(lit(1), n), i => {
      val ui = (pmod(xxhash64(lit(seed), id, i), lit(1L << 40))
        .cast("double") / lit((1L << 40).toDouble))
      pick(vals, ui)
    })
    val joined = array_join(arr, sep)
    if (cap.isEmpty) joined else concat(initcap(substring(joined, 1, 1)),
      substring(joined, 2, 1000000), lit(cap))
  }

  private def stringCol(name: String, strat: String,
      range: Option[(JsonNode, JsonNode)], scale: Double, u: Column,
      seed: String, id: Column): Column = {
    val (lo, hi) = range.map(r => (r._1.asLong(), r._2.asLong()))
      .getOrElse((0L, 25L))
    val nIn = (lit(lo) + floor(u * math.max(1L, hi - lo)).cast("long"))
      .cast("int")
    val n = greatest(nIn, lit(1))
    def w(tag: String) = s"$seed/$name/$tag"
    strat match {
      case "increment" =>
        pmod((id.cast("double") * scale).cast("long"),
          lit(Long.MaxValue)).cast("string")
      case "uniform" =>
        // random lowercase string, length in [lo, hi)
        val alphabet = array("abcdefghijklmnopqrstuvwxyz"
          .map(ch => lit(ch.toString)): _*)
        when(nIn <= 0, lit(""))
          .otherwise(array_join(transform(sequence(lit(1), nIn), i =>
            element_at(alphabet,
              (pmod(xxhash64(lit(w("ch")), id, i), lit(26L)) + 1)
                .cast("int"))), ""))
      case "word" => pick(Words, u)
      case "words" => picks(Words, w("words"), n, " ", id)
      case "sentence" => picks(Words, w("sent"), greatest(n, lit(3)), " ", id, ".")
      case "sentences" => picks(Words, w("sents"), greatest(n, lit(6)), " ", id, ".")
      case "paragraph" => picks(Words, w("para"), greatest(n, lit(12)), " ", id, ".")
      case "paragraphs" => picks(Words, w("paras"), greatest(n, lit(24)), " ", id, ".")
      case "first_name" => pick(FirstNames, u)
      case "last_name" => pick(LastNames, u)
      case "name" | "name_with_title" =>
        val full = concat(pick(FirstNames, u), lit(" "),
          pick(LastNames, u01(w("ln"), id)))
        if (strat == "name_with_title") concat(lit("Dr. "), full) else full
      case "title" => lit("Dr.")
      case "suffix" => lit("Jr.")
      case "username" =>
        concat(lower(pick(FirstNames, u)),
          floor(u01(w("un"), id) * 1000).cast("long").cast("string"))
      case "email" =>
        concat(lower(pick(FirstNames, u)), lit("."),
          lower(pick(LastNames, u01(w("ln"), id))), lit("@example."),
          pick(DomainSuffixes, u01(w("dom"), id)))
      case "domain_suffix" => pick(DomainSuffixes, u)
      case "ipv4" | "ip" =>
        concat_ws(".", (1 to 4).map(i =>
          pmod(xxhash64(lit(w(s"ip$i")), id), lit(256L))
            .cast("string")): _*)
      case "phone_number" | "cell_number" =>
        concat(lit("555-"),
          lpad(pmod(xxhash64(lit(w("ph")), id), lit(10000L))
            .cast("string"), 4, "0"))
      case "city_name" => pick(CityNames, u)
      case "country_name" => pick(CountryCodes, u) // code stands in
      case "country_code" => pick(CountryCodes, u)
      case "state_abbr" => pick(StateAbbrs, u)
      case "state_name" => pick(StateAbbrs, u)
      case "zip_code" | "post_code" =>
        lpad(pmod(xxhash64(lit(w("zip")), id), lit(100000L))
          .cast("string"), 5, "0")
      case other => sys.error(
        s"datagen $name: string strategy '$other' not implemented " +
          "(supported: increment, uniform, word(s), sentence(s), " +
          "paragraph(s), first_name, last_name, name, name_with_title, " +
          "title, suffix, username, email, domain_suffix, ipv4/ip, " +
          "phone_number/cell_number, city_name, country_name/code, " +
          "state_abbr/name, zip_code/post_code, or use `values`)")
    }
  }
}
