package graft

import graft.queries.PgCorpus

/** Foreign-corpus INCREMENTAL equivalence — the reference's SLT `-inc`
  * contract (sql-to-dbsp-compiler README.md:147,186-192): the corpus
  * fixture rows arrive as three delta steps (with a retract/re-insert
  * wave) through the Pipeline IVM path, and every eligible query's
  * FINAL view state must equal the corpus-RECORDED answer. This grades
  * incremental maintenance on queries authored by neither this repo
  * nor its oracle — the class IvmFuzzSpec's self-authored views cannot
  * reach.
  */
class PgCorpusIncSpec extends SparkSpec {

  for (name <- PgCorpus.incSuites)
    test(s"pgcorpus incremental replay: $name") {
      val suite = PgCorpus.load(name)
      val eligible = PgCorpus.incEligible(suite)
      assert(eligible.nonEmpty, s"$name: no eligible queries")
      val actual = PgCorpus.runSuiteIncremental(spark, suite)
        .collect().map(r => (r.getString(0), r.getString(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
      val failures = scala.collection.mutable.Buffer[String]()
      for (t <- eligible) {
        val exp = t.expected.map(_.mkString("|")).sorted
        val act = actual.getOrElse(t.id, Seq.empty)
        if (act != exp)
          failures += s"${t.id}: MISMATCH\n  query: ${t.query
            .linesIterator.mkString(" ").take(160)}\n  expect(${exp
            .size}): ${exp.take(6).mkString(" ; ")}\n  actual(${act
            .size}): ${act.take(6).mkString(" ; ")}"
      }
      info(s"$name: ${eligible.size - failures.size}/${eligible.size} " +
        "pass incrementally")
      assert(failures.isEmpty,
        s"\n== $name inc: ${failures.size}/${eligible.size} failed ==\n" +
          failures.mkString("\n"))
    }
}
