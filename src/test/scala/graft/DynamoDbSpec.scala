package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.functions._

import graft.sources.{Connectors, DynamoDb}
import graft.tools.DynamoStubServer
import graft.zset.ZSets

class DynamoDbSpec extends SparkSpec {
  import spark.implicits._

  private def conf(endpoint: String, secret: String,
      extra: Map[String, String] = Map.empty) =
    Connectors.ConnectorConf("dynamodb_output",
      Map("table" -> "t", "region" -> "local",
        "endpoint_url" -> endpoint,
        "aws_access_key_id" -> "AKIATEST",
        "aws_secret_access_key" -> secret) ++ extra,
      "json", Map.empty, index = Some("ix"))

  test("batch mode converges the table through an insert/update/delete " +
      "schedule, retrying unprocessed items") {
    val srv = new DynamoStubServer(Seq("id"), "s3cr3t",
      unprocessedFirst = true)
    try {
      Connectors.writeView(
        Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
          .toDF("id", "v", ZSets.W),
        conf(srv.endpoint, "s3cr3t"), indexKeys = Some(Seq("id")))
      assert(srv.store.size === 3)
      // the first call held back one unprocessed item → a retry happened
      assert(srv.calls.get() >= 2)

      Connectors.writeView(
        Seq((1L, "a", -1L), (1L, "a2", 1L), (2L, "b", -1L))
          .toDF("id", "v", ZSets.W),
        conf(srv.endpoint, "s3cr3t"), indexKeys = Some(Seq("id")))
      assert(srv.store.size === 2)
      val item1 = srv.store(("""{"id":{"N":"1"}}"""))
      assert(item1.contains(""""S":"a2""""))
    } finally srv.close()
  }

  test("write_parallelism ships partitions from executor tasks " +
      "concurrently and still converges") {
    // 120 rows / batch_size 10 = 12 requests; 60ms of stub latency per
    // request means 4-way-parallel delivery MUST overlap (serial would
    // stay at maxInFlight 1)
    val srv = new DynamoStubServer(Seq("id"), "s3cr3t",
      responseDelayMs = 60L)
    try {
      val rows = (1L to 120L).map(i => (i, s"v$i", 1L))
      Connectors.writeView(
        rows.toDF("id", "v", ZSets.W).repartition(8),
        conf(srv.endpoint, "s3cr3t",
          Map("write_parallelism" -> "4", "batch_size" -> "10")),
        indexKeys = Some(Seq("id")))
      assert(srv.store.size === 120)
      assert(srv.maxInFlight.get() >= 2,
        s"expected overlapping requests, saw max ${srv.maxInFlight.get()}")
      // signatures verified server-side on every task's connection
      assert(srv.badSignatures.get() === 0)

      // deletes flow through the same parallel path
      Connectors.writeView(
        (1L to 60L).map(i => (i, s"v$i", -1L)).toDF("id", "v", ZSets.W)
          .repartition(8),
        conf(srv.endpoint, "s3cr3t",
          Map("write_parallelism" -> "4", "batch_size" -> "10")),
        indexKeys = Some(Seq("id")))
      assert(srv.store.size === 60)
    } finally srv.close()
  }

  test("SigV4 is verified server-side; a wrong secret is rejected") {
    val srv = new DynamoStubServer(Seq("id"), "right")
    try {
      val err = intercept[Exception] {
        Connectors.writeView(
          Seq((1L, "a", 1L)).toDF("id", "v", ZSets.W),
          conf(srv.endpoint, "wrong"), indexKeys = Some(Seq("id")))
      }
      assert(TestErrors.messageChain(err)
        .exists(_.contains("InvalidSignature")))
      assert(srv.badSignatures.get() === 1 && srv.store.isEmpty)
    } finally srv.close()
  }

  test("transactional mode: attribute_not_exists skips the replayed " +
      "insert, the rest of the transaction applies") {
    val srv = new DynamoStubServer(Seq("id"), "s")
    try {
      val c = conf(srv.endpoint, "s", Map(
        "write_mode" -> "transactional",
        "put_condition_expression" -> "attribute_not_exists(id)"))
      Connectors.writeView(Seq((1L, "orig", 1L)).toDF("id", "v", ZSets.W),
        c, indexKeys = Some(Seq("id")))
      assert(srv.store(("""{"id":{"N":"1"}}""")).contains("orig"))
      // replay key 1 with a different value + a new key 2: the guarded
      // put is skipped, key 2 lands
      Connectors.writeView(
        Seq((1L, "replayed", 1L), (2L, "new", 1L)).toDF("id", "v", ZSets.W),
        c, indexKeys = Some(Seq("id")))
      assert(srv.store(("""{"id":{"N":"1"}}""")).contains("orig"))
      assert(srv.store(("""{"id":{"N":"2"}}""")).contains("new"))
    } finally srv.close()
  }

  test("signing matches AWS's officially published SigV4 example") {
    // docs.aws.amazon.com "Signature Version 4 signing process" worked
    // example: GET https://iam.amazonaws.com/?Action=ListUsers&
    // Version=2010-05-08 at 20150830T123600Z with the documented demo
    // secret — expected signature published alongside it
    val now = java.time.LocalDateTime.parse("20150830T123600Z",
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'"))
      .toInstant(java.time.ZoneOffset.UTC)
    val headers = scala.collection.immutable.TreeMap(
      "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
      "host" -> "iam.amazonaws.com",
      "x-amz-date" -> "20150830T123600Z")
    val (signed, signature, scope) = DynamoDb.signV4General("GET",
      java.net.URI.create(
        "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08"),
      "us-east-1", "iam", Array.emptyByteArray,
      "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", headers, now)
    assert(signed === "content-type;host;x-amz-date")
    assert(scope === "20150830/us-east-1/iam/aws4_request")
    assert(signature ===
      "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("non-indexed views are rejected with the uniqueness contract") {
    val err = intercept[IllegalArgumentException] {
      Connectors.writeView(Seq((1L, "a")).toDF("id", "v"),
        conf("http://127.0.0.1:1", "s"))
    }
    assert(err.getMessage.contains("indexed view"))
  }
}
