package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: micro-measure expression pipelines in isolation.
  * Not part of any graded path; contents change freely between
  * experiments.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // per-job trace (description + timing), same shape as JobMeter's
    if (sys.env.contains("SPARK_GRAFT_TRACE")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val p = j.properties
            val desc = Option(p).map(_.getProperty(
              "spark.job.description", "")).getOrElse("")
            val st = j.stageInfos.map(_.name.split("\n").head.take(60))
              .mkString(" | ")
            println(s"  JOB ${j.jobId}: [$desc] stages: $st")
          }
        })
    }
    import graft.llm.{Dedup, TextAnalysis}

    if (sys.env.contains("SPARK_GRAFT_NORMDBG")) {
      for (q <- sys.env("SPARK_GRAFT_NORMDBG").split(";;"))
        println(s"IN : $q\nOUT: ${graft.ddl.Dialect.normalize(q)}")
      spark.stop()
      return
    }

    if (sys.env.contains("SPARK_GRAFT_NEXDBG")) {
      // decompose nexmark_q0's wall: program parse, Pipeline
      // construction (shape classification), each step, snapshot reads
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"NEXPHASE $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        r
      }
      val s = spark.newSession()
      graft.functions.Registry.registerAll(s)
      val program = graft.queries.Nexmark.programSql
      val pipe = t("construct")(graft.runtime.Pipeline(s, program))
      val frames = t("gen-frames")(graft.queries.Nexmark.genFrames(s))
      import graft.zset.ZSets
      def slice(df: org.apache.spark.sql.DataFrame, k: Int) =
        df.where(pmod(hash(df.columns.map(col): _*), lit(3)) === k)
      t("step1")(pipe.step(frames.map { case (n, f) =>
        n -> ZSets.lift(slice(f, 0).unionByName(slice(f, 1))) }))
      t("step2")(pipe.step(frames.map { case (n, f) =>
        n -> ZSets.lift(slice(f, 2)).unionByName(
          ZSets.negate(ZSets.lift(slice(f, 0)))) }))
      t("step3")(pipe.step(frames.map { case (n, f) =>
        n -> ZSets.lift(slice(f, 0)) }))
      graft.queries.Nexmark.gradedViews.foreach { v =>
        t(s"read $v")(org.apache.spark.sql.graft.Shims.internalRows(
          pipe.adHoc(s"SELECT * FROM $v")))
      }
      spark.stop()
      return
    }

    if (sys.env.contains("SPARK_GRAFT_STEPDBG")) {
      import graft.queries.StreamCorpus
      val Array(sname, uname) = sys.env("SPARK_GRAFT_STEPDBG").split(":", 2)
      val suite = StreamCorpus.load(sname)
      val u = suite.units.find(_.id == uname).getOrElse(
        sys.error(s"no unit $uname in $sname"))
      println(s"== PROGRAM\n${u.program}")
      try {
        val acts = StreamCorpus.runSuite(spark,
          suite.copy(units = Seq(u)), Set.empty)
          .collect().map(r => (r.getString(0), r.getString(1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
        val exps = StreamCorpus.expectedRows(suite.copy(units = Seq(u)),
          Set.empty).groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
        for (sid <- (acts.keySet ++ exps.keySet).toSeq.sorted) {
          val ok = acts.getOrElse(sid, Nil) == exps.getOrElse(sid, Nil)
          println(s"$sid ${if (ok) "OK" else "MISMATCH"}")
          if (!ok) {
            println(s"  exp: ${exps.getOrElse(sid, Nil).mkString(" ; ")}")
            println(s"  act: ${acts.getOrElse(sid, Nil).mkString(" ; ")}")
          }
        }
      } catch { case e: Throwable => e.printStackTrace() }
      spark.stop()
      return
    }

    if (sys.env.contains("SPARK_GRAFT_SQLDBG")) {
      graft.functions.Registry.registerAll(spark)
      for (q <- sys.env("SPARK_GRAFT_SQLDBG").split(";;")) {
        try {
          val df = graft.queries.PgCorpus.runQuery(spark, q)
          println(s"Q: $q\n  schema: ${df.schema.simpleString}\n  rows: " +
            df.collect().take(5).mkString(" | "))
          if (sys.env.contains("SPARK_GRAFT_SQLDBG_PLAN"))
            println(df.queryExecution.analyzed.treeString)
        } catch {
          case e: Throwable => println(s"Q: $q\n  ERROR ${e.getMessage.take(200)}")
        }
      }
      spark.stop()
      return
    }

    if (sys.env.contains("SPARK_GRAFT_BATCHDBG")) {
      import graft.queries.PgCorpus
      val name = sys.env("SPARK_GRAFT_BATCHDBG")
      val suite = PgCorpus.load(name)
      PgCorpus.registerSetup(spark, suite)
      val skip = PgCorpus.skips(name)
      for (t <- suite.tests if !skip(t.id)) {
        val t0 = System.nanoTime()
        try {
          val n = PgCorpus.runQuery(spark, t.query).count()
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms > 300)
            println(f"${t.id}%-28s rows=$n%-5d $ms%8.0f ms")
        } catch {
          case e: Throwable =>
            println(s"${t.id} ERROR ${e.getMessage.take(100)}")
        }
      }
      spark.stop()
      return
    }

    if (sys.env.contains("SPARK_GRAFT_INCDBG")) {
      // bisect the aggq incremental-replay OOM: one pipeline per query
      import graft.queries.PgCorpus
      val name = sys.env.getOrElse("SPARK_GRAFT_INCDBG", "aggq")
      val suite = PgCorpus.load(name)
      val eligible = PgCorpus.incEligible(suite)
      println(s"eligible: ${eligible.size}")
      if (sys.env.contains("SPARK_GRAFT_INCDBG_SETUP")) {
        val defs = PgCorpus.registerSetup(spark, suite)
        for ((n, cs) <- defs) {
          val t0 = System.nanoTime()
          val c = spark.table(n).count()
          println(f"table $n%-12s rows=$c%-4d " +
            f"${(System.nanoTime() - t0) / 1e9}%5.1f s  " +
            cs.map(_._2).mkString(","))
        }
        import graft.zset.ZSets
        val defs2 = defs
        def pipeType(t: String): String = t.toUpperCase match {
          case "FLOAT" => "REAL"
          case "DECIMAL" => "DECIMAL(38, 10)"
          case other => other
        }
        val frames = defs2.map { case (n, cs) =>
          n -> spark.table(n).selectExpr(cs.map { case (c, t) =>
            s"CAST($c AS ${pipeType(t)}) AS $c" }: _*)
            .localCheckpoint(true)
        }
        println("frames ok: " + frames.map(_._2.count()).sum)
        val ddl = defs2.map { case (n, cs) =>
          s"CREATE TABLE $n (${cs.map { case (c, t) =>
            s"$c ${pipeType(t)}" }.mkString(", ")});" }
        val vsql = sys.env.getOrElse("SPARK_GRAFT_INCDBG_VIEW", "")
        val prog = ddl.mkString("\n") +
          (if (vsql.nonEmpty)
            s"\nCREATE MATERIALIZED VIEW incv0 AS $vsql;" else "")
        val pipe = graft.runtime.Pipeline(spark, prog)
        println("pipeline ok")
        def slice(df: org.apache.spark.sql.DataFrame, k: Int) =
          df.where(pmod(hash(df.columns.map(col): _*), lit(3)) === k)
        pipe.step(frames.map { case (n, f) =>
          n -> ZSets.lift(slice(f, 0).unionByName(slice(f, 1))) }.toMap)
        println("step1 ok")
        pipe.step(frames.map { case (n, f) =>
          n -> ZSets.lift(slice(f, 2)).unionByName(
            ZSets.negate(ZSets.lift(slice(f, 0)))) }.toMap)
        println("step2 ok")
        spark.stop(); return
      }
      for (t <- eligible) {
        val single = suite.copy(tests = Seq(t))
        val t0 = System.nanoTime()
        try {
          val n = PgCorpus.runSuiteIncremental(spark, single).count()
          println(f"${t.id}%-28s rows=$n%-5d ${(System.nanoTime() - t0) / 1e9}%6.1f s")
        } catch {
          case e: Throwable =>
            println(s"${t.id} ERROR ${e.getMessage.take(120)}")
            e.printStackTrace()
        }
      }
      spark.stop()
      return
    }

    if (sys.env.contains("SPARK_GRAFT_FLOOR")) {
      def floor(name: String)(mk: => Unit): Unit = {
        (1 to 5).foreach(_ => mk) // warm
        val t0 = System.nanoTime()
        (1 to 20).foreach(_ => mk)
        println(f"FLOOR $name%-36s ${(System.nanoTime() - t0) / 20e6}%8.1f ms/job")
      }
      floor("collect no-shuffle") {
        spark.range(2).selectExpr("sum(id)").collect(); ()
      }
      floor("collect shuffle(2)") {
        spark.range(2).repartition(2).selectExpr("sum(id)").collect(); ()
      }
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      floor("collect shuffle(2) AQE off") {
        spark.range(2).repartition(2).selectExpr("sum(id)").collect(); ()
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      floor("noop write shuffle(2)") {
        spark.range(2).repartition(2).write.format("noop")
          .mode("overwrite").save()
      }
      floor("broadcast-join tiny") {
        val a = spark.range(4).toDF("k")
        val b = broadcast(spark.range(4).toDF("k"))
        a.join(b, "k").selectExpr("count(*)").collect(); ()
      }
      floor("collect 1-partition range") {
        spark.range(0, 2, 1, 1).selectExpr("sum(id)").collect(); ()
      }
      floor("collect 4-partition range") {
        spark.range(0, 2, 1, 4).selectExpr("sum(id)").collect(); ()
      }
      floor("count cached 1-part rdd") {
        val r = spark.range(0, 2, 1, 1)
        r.count(); ()
      }
      spark.stop()
      return
    }

    if (sys.env.contains("SPARK_GRAFT_Q8PROF")) {
      // q8 standing-join phase profile: replicate StreamBench's
      // q8_ivmjoin work OUTSIDE streaming (2 half-stream batches through
      // the same trace appends + coPartJoinStep + noop sink) so the
      // append / join / sink phases time separately, and the streaming
      // machinery cost shows up as (StreamBench total − this total).
      val n = sys.env.getOrElse("SPARK_GRAFT_STREAM_EVENTS", "20000000").toLong
      val nB = 8
      val dir = java.nio.file.Files.createTempDirectory("q8prof").toString
      spark.range(n).select(
        col("id").as("bid_id"),
        timestamp_millis(lit(1700000000000L) + expr("id div 10"))
          .as("date_time"),
        (col("id") % 1000L).as("auction"),
        (col("id") % 5000).as("bidder"),
        (pmod(col("id") * 2654435761L, lit(10000L)) + 100).as("price"))
        .write.mode("overwrite").parquet(s"$dir/bid")
      val bid = spark.read.parquet(s"$dir/bid")
      def split(b: org.apache.spark.sql.DataFrame) = (
        b.filter(pmod(col("bid_id"), lit(2)) === 0)
          .select(col("bid_id").as("k"), col("bidder").as("l_bidder"),
            col("price").as("l_price"), lit(1L).as("_w")),
        b.filter(pmod(col("bid_id"), lit(2)) === 1)
          .select((col("bid_id") - 1).as("k"), col("bidder").as("r_bidder"),
            col("price").as("r_price"), lit(1L).as("_w")))
      import graft.incremental.{BucketedTrace, MemoryTrace}
      def phase(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"Q8PROF $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
      val tTotal0 = System.nanoTime()
      var aT: MemoryTrace = null
      var bT: MemoryTrace = null
      (0 until 2).foreach { half =>
        val batch = bid.filter(col("bid_id") % 4 / 2 === half)
        val (dA, dB) = split(batch)
        if (aT == null) {
          aT = new MemoryTrace(dA, Seq("k"),
            autoCompactRuns = Int.MaxValue, hashParts = Some(nB))
          bT = new MemoryTrace(dB, Seq("k"),
            autoCompactRuns = Int.MaxValue, hashParts = Some(nB))
        }
        // the step's internal appends are EAGER (persist+count); the join
        // terms stay lazy until the sink — so "step" times the appends
        // and "sink" times the run-vs-run joins
        var d: org.apache.spark.sql.DataFrame = null
        phase(s"b$half step(appends)") {
          d = BucketedTrace.coPartJoinStep(aT, bT, dA, dB, Seq("k"))
        }
        phase(s"b$half sink(joins)") {
          org.apache.spark.sql.graft.Shims.internalBarrier(d)
            .write.format("noop").mode("overwrite").save()
        }
      }
      println(f"Q8PROF TOTAL                   ${(System.nanoTime() - tTotal0) / 1e9}%7.2f s  (${n / ((System.nanoTime() - tTotal0) / 1e9) / 1e6}%.2f M ev/s)")
      spark.stop()
      return
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(32, col("doc_id")).select(col("doc_id"), col("text"))
      .localCheckpoint(true)

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"TIME $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
    }

    // warmup
    docs.select(count(lit(1))).collect()

    time("tokens only") {
      docs.select(TextAnalysis.tokens(col("text")).as("t"))
        .select(sum(size(col("t")))).collect()
    }
    time("tokens+md5 per token") {
      docs.select(transform(TextAnalysis.tokens(col("text")),
          t => Dedup.md5Hash(t, 0)).as("th"))
        .select(sum(size(col("th")))).collect()
    }
    time("md5 only (whole text)") {
      docs.select(Dedup.md5Hash(col("text"), 0).as("h"))
        .select(sum(pmod(col("h"), lit(1000003L)))).collect()
    }
    val grams = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
      .filter(size(col("_toks")) >= 3)
      .select(col("doc_id"),
        transform(col("_toks"), t => Dedup.md5Hash(t, 0)).as("_th"))
      .select(col("doc_id"), array_distinct(
        transform(sequence(lit(1), size(col("_th")) - 2),
          i => aggregate(slice(col("_th"), i, lit(3)), lit(7L),
            (acc, h) => (acc * 131L + h) % Dedup.FP_P))).as("_g"))
    time("full gram pipeline") {
      grams.select(sum(size(col("_g")))).collect()
    }
    time("full gram pipeline x2") {
      grams.select(sum(size(col("_g")))).collect()
    }
    time("gram persist + explode + materialize") {
      val p = grams.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val g = graft.incremental.Trace.materialize(
        p.select(col("doc_id"), explode(col("_g")).as("_h")))
      p.unpersist()
      ()
    }
    time("gram explode + materialize (no persist)") {
      val g = graft.incremental.Trace.materialize(
        grams.select(col("doc_id"), explode(col("_g")).as("_h")))
      ()
    }
    time("gram explode + count only") {
      grams.select(col("doc_id"), explode(col("_g")).as("_h"))
        .select(count(lit(1))).collect()
      ()
    }

    // kmeans cells in isolation
    {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .repartition(32, col("vec_id")).select("vec_id", "embedding")
        .localCheckpoint(true)
      time("kmeansCellsQuantized") {
        graft.llm.Similarity.kmeansCellsQuantized(emb, nCells = 16,
          scale = 1000).write.format("noop").mode("overwrite").save()
      }
      time("kmeansCellsQuantized x2") {
        graft.llm.Similarity.kmeansCellsQuantized(emb, nCells = 16,
          scale = 1000).write.format("noop").mode("overwrite").save()
      }
      import graft.functions.VectorDot.dist2L
      val q = emb.select(col("vec_id").as("__id"),
        graft.llm.Similarity.quantize(col("embedding"), 1000).as("__qv"))
        .localCheckpoint(true)
      val seeds = q.filter(col("__id") < 16)
        .select(col("__id").cast("int").as("__cell"), col("__qv").as("__cv"))
        .localCheckpoint(true)
      time("assign crossJoin+dist2L only") {
        q.crossJoin(broadcast(seeds))
          .select(sum(pmod(dist2L(col("__qv"), col("__cv")), lit(97L))))
          .collect()
      }
      time("assign + window rank") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("__id").orderBy(col("__d2"), col("__cell"))
        q.crossJoin(broadcast(seeds))
          .withColumn("__d2", dist2L(col("__qv"), col("__cv")))
          .withColumn("__rk", row_number().over(w)).filter(col("__rk") === 1)
          .select(count(lit(1))).collect()
      }
    }

    // replicate incrementalSpanDedup with per-phase timers
    {
      import graft.zset.ZSets
      val trace = new graft.incremental.TieredTrace(
        docs.select(lit(0L).as("_h")).limit(0)
          .withColumn(ZSets.W, lit(1L)),
        Seq("_h"), nBuckets = 16)
      (0 until 3).foreach { m =>
        val batch = docs.filter(col("doc_id") % 3 === m)
        var g: org.apache.spark.sql.DataFrame = null
        var seen: org.apache.spark.sql.DataFrame = null
        var scored: org.apache.spark.sql.DataFrame = null
        time(s"b$m grams+materialize") {
          val gr = batch
            .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
            .filter(size(col("_toks")) >= 3)
            .select(col("doc_id"),
              transform(col("_toks"), t => Dedup.md5Hash(t, 0)).as("_th"))
            .select(col("doc_id"), array_distinct(
              transform(sequence(lit(1), size(col("_th")) - 2),
                i => aggregate(slice(col("_th"), i, lit(3)), lit(7L),
                  (acc, h) => (acc * 131L + h) % Dedup.FP_P))).as("_g"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          g = graft.incremental.Trace.materialize(
            gr.select(col("doc_id"), explode(col("_g")).as("_h")))
          gr.unpersist()
          ()
        }
        time(s"b$m probe seen") {
          seen = graft.incremental.Trace.materialize(
            trace.probe(g.select("_h").distinct()).select("_h").distinct())
        }
        time(s"b$m score") {
          scored = graft.incremental.Trace.materialize(
            g.join(seen.withColumn("_hit", lit(1L)), Seq("_h"), "left")
              .groupBy(col("doc_id"))
              .agg(count(lit(1)).as("n_spans"),
                coalesce(sum(col("_hit")), lit(0L)).as("n_seen"))
              .select(col("doc_id"), col("n_spans"), col("n_seen"),
                (col("n_seen").cast("double") / col("n_spans")).as("overlap"))
              .withColumn("admitted", col("overlap") < lit(0.5)))
        }
        time(s"b$m append new hashes") {
          val newHashes = g
            .join(scored.filter(col("admitted")).select("doc_id"), Seq("doc_id"))
            .select("_h").distinct()
            .join(seen, Seq("_h"), "left_anti")
          trace.append(newHashes.withColumn(ZSets.W, lit(1L)))
        }
      }
      trace.delete()
    }
    spark.stop()
  }
}
