package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // one viral key (k=1, 5000 rows) plus a long tail
  private def probe = spark.range(6000).select(
    when(col("id") < 5000, 1L).otherwise(col("id") - 4998).as("k"),
    col("id").as("pv"))
  private def build = spark.range(1, 900).select(
    col("id").as("k"), (col("id") * 10).as("bv"))

  test("salted join equals the plain join") {
    val plain = probe.join(build, Seq("k"))
      .select("k", "pv", "bv").as[(Long, Long, Long)].collect().sorted
    val s = SkewJoin.salted(probe, build, Seq("k"), factor = 8)
      .select("k", "pv", "bv").as[(Long, Long, Long)].collect().sorted
    assert(s.sameElements(plain))
  }

  test("hot-key two-path join equals the plain join") {
    val plain = probe.join(build, Seq("k"))
      .select("k", "pv", "bv").as[(Long, Long, Long)].collect().sorted
    val s = SkewJoin.saltedHot(probe, build, Seq("k"),
      hotValues = Seq(1L), factor = 8)
      .select("k", "pv", "bv").as[(Long, Long, Long)].collect().sorted
    assert(s.sameElements(plain))
  }

  test("salting spreads the hot key across reducers") {
    // post-join partition distribution of the hot key: with salting the
    // 5000 hot rows must NOT all land in one shuffle partition
    val parts = SkewJoin.salted(probe, build, Seq("k"), factor = 8)
      .filter(col("k") === 1)
      .select(spark_partition_id().as("p"))
      .distinct().count()
    assert(parts > 1, s"hot key stayed in $parts partition(s)")
  }
}
