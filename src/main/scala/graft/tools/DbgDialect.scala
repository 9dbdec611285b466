package graft.queries
object DbgDialect extends App {
  val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]").config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  def esc(s: String) = s.flatMap(c => if (c < ' ' || c > '~') f"<${c.toInt}%02x>" else c.toString)
  for (name <- Seq(sys.env.getOrElse("DBG_SUITE", "date"))) {
    val suite = PgCorpus.load(name)
    PgCorpus.registerSetup(spark, suite)
    var shown = 0
    for (t <- suite.tests if shown < 18) {
      try {
        val acts = PgCorpus.renderedRows(PgCorpus.runQuery(spark, t.query))
          .collect().map(_.getString(0)).toSeq.sorted
        val exps = t.expected.map(_.mkString("|")).sorted
        if (acts != exps) { shown += 1
          println(s"MM ${t.id} q=${esc(t.query.linesIterator.mkString(" ").take(100))}")
          println(s"   exp(${exps.size})=${exps.take(3).map(esc).mkString(" ; ")}")
          println(s"   act(${acts.size})=${acts.take(3).map(esc).mkString(" ; ")}")
        }
      } catch { case e: Throwable => shown += 1
        println(s"ER ${t.id}: ${esc(e.getMessage.linesIterator.next().take(110))} q=${esc(t.query.linesIterator.mkString(" ").take(80))}") }
    }
  }
}
