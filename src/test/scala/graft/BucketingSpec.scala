package graft


import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (SURVEY "Partitioning & shuffle": big
  * fact-fact joins should pre-bucket on the join key so repeated joins
  * are exchange-free). At 100 TB this is the difference between shuffling
  * 100 TB per join and shuffling nothing.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    Seq("li_bucketed", "o_bucketed").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), tbl)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")

    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString

    // the join itself must read both bucketed sides with NO exchange
    // between scan and join (only the post-join aggregate may shuffle)
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin")
      || plan.contains("SortMergeJoin"))
    val exchangesBeforeJoin = plan
      .linesIterator
      .dropWhile(l => !l.contains("Join"))
      .count(_.contains("Exchange"))
    assert(exchangesBeforeJoin === 0,
      s"expected exchange-free bucketed join, got:\n$plan")

    // and the result matches the unbucketed join
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(expected).isEmpty
      && expected.exceptAll(joined).isEmpty)

    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
