package graft

import graft.queries.StreamCorpus

/** Runs the ported STEP-WISE streaming corpus (resources/streamcorpus,
  * see scripts/port_streamcorpus.py): each unit's program runs as one
  * standing Pipeline, and EVERY step's emitted output-view delta must
  * match the reference-recorded delta (value cells + weight) as a
  * multiset. Per-step grading is the contract final-state replay
  * cannot enforce: compensating delta-rule errors cancel in final
  * state but not here.
  */
class StreamCorpusSpec extends SparkSpec {

  private def checkSuite(name: String): Unit = {
    val suite = StreamCorpus.load(name)
    val skip = StreamCorpus.skips(name)
    val failures = scala.collection.mutable.Buffer[String]()
    var ran = 0
    for (u <- suite.units if !skip(u.id)) {
      ran += 1
      try {
        val actual = StreamCorpus.runSuite(spark,
          suite.copy(units = Seq(u)), Set.empty)
          .collect().map(r => (r.getString(0), r.getString(1)))
        val act = actual.groupBy(_._1).view.mapValues(
          _.map(_._2).toSeq.sorted).toMap
        val exp = StreamCorpus.expectedRows(suite.copy(units = Seq(u)),
          Set.empty).groupBy(_._1).view.mapValues(
          _.map(_._2).sorted).toMap
        for (sid <- (act.keySet ++ exp.keySet).toSeq.sorted) {
          val a = act.getOrElse(sid, Seq.empty)
          val e = exp.getOrElse(sid, Seq.empty)
          if (a != e)
            failures += s"$sid: MISMATCH\n  expect(${e.size}): ${e
              .take(6).mkString(" ; ")}\n  actual(${a.size}): ${a
              .take(6).mkString(" ; ")}"
        }
      } catch {
        case ex: Throwable =>
          failures += s"${u.id}: ERROR ${Option(ex.getMessage)
            .getOrElse(ex.toString).linesIterator.take(3)
            .mkString(" ").take(240)}"
      }
    }
    info(s"$name: ${ran - failures.size}/$ran units clean" +
      (if (skip.nonEmpty) s" (${skip.size} skipped)" else ""))
    assert(failures.isEmpty,
      s"\n== $name: ${failures.size} failing steps/units ==\n" +
        failures.mkString("\n"))
  }

  for (s <- StreamCorpus.suiteNames)
    test(s"streamcorpus step-wise: $s") { checkSuite(s) }
}
