package graft

import graft.queries.PgCorpus

/** Runs the ported PostgreSQL-regression conformance corpus
  * (resources/pgcorpus, see scripts/port_pgcorpus.py) suite by suite:
  * every non-skipped test's result must match the corpus-RECORDED
  * expected output as a multiset of canonical rendered rows. This is
  * the foreign-corpus anchor: queries and answers authored by neither
  * this repo nor DuckDB.
  */
class PgCorpusSpec extends SparkSpec {

  private def checkSuite(name: String): Unit = {
    val suite = PgCorpus.load(name)
    val skip = PgCorpus.skips(name)
    PgCorpus.registerSetup(spark, suite)
    val failures = scala.collection.mutable.Buffer[String]()
    var ran = 0
    for (t <- suite.tests if !skip(t.id)) {
      val outcome =
        try {
          val actual = PgCorpus.runQuery(spark, t.query)
          val acts = PgCorpus.renderedRows(actual, PgCorpus.modes(name))
            .collect().map(_.getString(0)).toSeq.sorted
          val exps = t.expected.map(_.mkString("|")).sorted
          if (acts == exps) None
          else Some(s"${t.id}: MISMATCH\n  query: ${t.query.linesIterator
            .mkString(" ").take(160)}\n  expect(${exps.size}): ${exps
            .take(6).mkString(" ; ")}\n  actual(${acts.size}): ${acts
            .take(6).mkString(" ; ")}")
        } catch {
          case e: Throwable =>
            Some(s"${t.id}: ERROR ${e.getMessage.linesIterator
              .take(3).mkString(" ").take(240)}\n  query: ${t.query
              .linesIterator.mkString(" ").take(160)}")
        }
      ran += 1
      outcome.foreach(failures += _)
    }
    info(s"$name: ${ran - failures.size}/$ran pass" +
      (if (skip.nonEmpty) s" (${skip.size} skipped)" else ""))
    assert(failures.isEmpty,
      s"\n== $name: ${failures.size}/$ran failed ==\n" +
        failures.mkString("\n"))
  }

  for (s <- PgCorpus.gradedSuites)
    test(s"pgcorpus suite: $s") { checkSuite(s) }
}
