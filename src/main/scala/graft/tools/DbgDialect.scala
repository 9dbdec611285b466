package graft.queries
object DbgDialect extends App {
  val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]").config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  def esc(s: String) = s.flatMap(c => if (c < ' ' || c > '~') f"<${c.toInt}%02x>" else c.toString)
  for (name <- sys.env.getOrElse("DBG_SUITE", "time").split(",")) {
    val suite = PgCorpus.load(name)
    try PgCorpus.registerSetup(spark, suite)
    catch { case e: Throwable => println(s"SETUP-ERR $name: ${e.getMessage.take(200)}") }
    var bad = 0
    for (t <- suite.tests if bad < 14) {
      try {
        val acts = PgCorpus.renderedRows(PgCorpus.runQuery(spark, t.query))
          .collect().map(_.getString(0)).toSeq.sorted
        val exps = t.expected.map(_.mkString("|")).sorted
        if (acts != exps) { bad += 1
          println(s"MM $name/${t.id} q=${esc(t.query.linesIterator.mkString(" ").take(95))}")
          println(s"   exp(${exps.size})=${exps.take(3).map(esc).mkString(" ; ")}")
          println(s"   act(${acts.size})=${acts.take(3).map(esc).mkString(" ; ")}")
        }
      } catch { case e: Throwable => bad += 1
        println(s"ER $name/${t.id}: ${esc(e.getMessage.linesIterator.next().take(100))} q=${esc(t.query.linesIterator.mkString(" ").take(70))}") }
    }
    println(s"== $name done (${suite.tests.size} tests)")
  }
}
