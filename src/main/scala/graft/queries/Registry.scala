package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** All graded queries, one entry per implemented operator from SURVEY §2
  * (+ the beyond-reference LLM-pipeline operators).
  */
object Registry {
  def all: Seq[Q] =
    Relational.queries ++
      Joins.queries ++
      Aggregates.queries ++
      SetOps.queries ++
      Windows.queries ++
      Functions.queries ++
      TimeSeries.queries ++
      LlmOps.queries ++
      Incremental.queries ++
      PipelineE2e.queries ++
      RuntimeE2e.queries ++
      ConnectorsE2e.queries ++
      SqlConformance.queries ++
      PgCorpus.queries ++
      PgCorpus.incQueries ++
      StreamCorpus.queries ++
      Nexmark.queries ++
      SltFuzz.queries ++
      TpcH.queries ++
      Extras.queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
