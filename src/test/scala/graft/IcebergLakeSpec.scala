package graft

import java.nio.file.Files

import graft.ddl.Ddl
import graft.sources.{Connectors, IcebergLake}
import graft.zset.ZSets

/** Native Iceberg metadata/manifest reads (JSON + Avro container files +
  * parquet, no iceberg jar): snapshot reads via metadata_location,
  * snapshot-id/datetime time travel, follow-mode change diffs over a
  * filesystem (version-hint) table, and the v2 delete-file guard
  * (docs/connectors/sources/iceberg.md).
  */
class IcebergLakeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("iceberg").toString

  test("append + snapshot round trip; time travel by snapshot id") {
    val dir = tmp()
    val s1 = IcebergLake.append(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val s2 = IcebergLake.append(spark, dir, Seq((3L, "c")).toDF("id", "s"))
    assert(s1 !== s2)
    val metaLoc = IcebergLake.currentMetadata(spark, dir)
    assert(IcebergLake.snapshot(spark, metaLoc).as[(Long, String)]
      .collect().toSet === Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(IcebergLake.snapshot(spark, metaLoc, snapshotId = Some(s1))
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
  }

  test("delete commit drops files; follow emits signed deltas") {
    val dir = tmp()
    IcebergLake.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val meta1 = IcebergLake.readMetadata(spark,
      IcebergLake.currentMetadata(spark, dir))
    val firstFiles = IcebergLake.manifestEntries(spark, meta1,
      meta1.snapshots.head._2).map(_.path)
    val start = meta1.currentSnapshotId.get
    // commit 2: add (3,c) and delete the first commit's files
    IcebergLake.append(spark, dir, Seq((3L, "c")).toDF("id", "s"),
      deletePaths = firstFiles)
    assert(IcebergLake.snapshot(spark,
      IcebergLake.currentMetadata(spark, dir)).as[(Long, String)]
      .collect().toSet === Set((3L, "c")))
    val delta = ZSets.consolidate(
      IcebergLake.changes(spark, dir, Some(start)))
      .as[(Long, String, Long)].collect().toSet
    assert(delta === Set((3L, "c", 1L), (1L, "a", -1L), (2L, "b", -1L)))
  }

  test("datetime resolution picks the newest snapshot at or before") {
    val dir = tmp()
    IcebergLake.append(spark, dir, Seq((1L, "a")).toDF("id", "s"))
    val cut = java.time.OffsetDateTime.now(java.time.ZoneOffset.UTC)
    Thread.sleep(20)
    IcebergLake.append(spark, dir, Seq((2L, "b")).toDF("id", "s"))
    assert(IcebergLake.snapshot(spark,
      IcebergLake.currentMetadata(spark, dir),
      datetime = Some(cut.toString)).as[(Long, String)]
      .collect().toSet === Set((1L, "a")))
  }

  test("connector dispatch: metadata_location snapshot + follow modes") {
    val dir = tmp()
    IcebergLake.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("a", "b"))
    val start = IcebergLake.readMetadata(spark,
      IcebergLake.currentMetadata(spark, dir)).currentSnapshotId.get
    IcebergLake.append(spark, dir, Seq((3L, "c")).toDF("a", "b"))
    def conf(extra: String) = {
      val json = s"""[{"transport": {"name": "iceberg_input", """ +
        s""""config": {$extra}}}]"""
      val t = Ddl.parse("CREATE TABLE t (a BIGINT NOT NULL, b VARCHAR) " +
        s"WITH ('connectors' = '$json');").tables.head
      (t, Connectors.connectorsOf(t).head)
    }
    val metaLoc = IcebergLake.currentMetadata(spark, dir)
    val (t1, c1) = conf(
      s""""metadata_location": "$metaLoc", "mode": "snapshot"""")
    assert(Connectors.read(spark, t1, c1).as[(Long, String, Long)]
      .collect().toSet
      === Set((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)))
    val (t2, c2) = conf(
      s""""uri": "$dir", "mode": "follow", "snapshot_id": "$start"""")
    assert(Connectors.read(spark, t2, c2).as[(Long, String, Long)]
      .collect().toSet === Set((3L, "c", 1L)))
    val (t3, c3) = conf(
      s""""uri": "$dir", "mode": "snapshot_and_follow", """ +
        s""""snapshot_id": "$start"""")
    assert(Connectors.read(spark, t3, c3).as[(Long, String, Long)]
      .collect().toSet
      === Set((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)))
    // follow modes reject metadata_location (doc contract)
    val (t4, c4) = conf(
      s""""metadata_location": "$metaLoc", "mode": "follow"""")
    val e = intercept[IllegalArgumentException](
      Connectors.read(spark, t4, c4))
    assert(e.getMessage.contains("metadata_location"))
  }

  test("v2 row-level delete files are rejected with a precise error") {
    val dir = tmp()
    IcebergLake.append(spark, dir, Seq((1L, "a")).toDF("id", "s"))
    val metaLoc = IcebergLake.currentMetadata(spark, dir)
    val meta = IcebergLake.readMetadata(spark, metaLoc)
    // forge a delete-file entry (content=1) and drive the real guard the
    // read path applies to every manifest entry set
    val entries = IcebergLake.manifestEntries(spark, meta,
      meta.snapshots.head._2).map(_.copy(content = 1))
    val e = intercept[IllegalArgumentException](
      IcebergLake.requireNoDeleteFiles(entries))
    assert(e.getMessage.contains("delete file"))
  }
}
