package graft

import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.sources.{Connectors, Redis}
import graft.tools.RedisStubServer
import graft.zset.ZSets

class RedisSpec extends SparkSpec {
  import spark.implicits._

  private def conf(port: Int, keyFields: String, sep: String = ":",
      auth: String = "") = Connectors.ConnectorConf(
    "redis_output",
    Map("connection_string" -> s"redis://${auth}127.0.0.1:$port/0",
      "key_separator" -> sep),
    "json", Map("key_fields" -> keyFields))

  test("insert/update/delete schedule converges the store to the " +
      "live snapshot, one atomic transaction per batch") {
    val srv = new RedisStubServer()
    try {
      val c = conf(srv.port, """["c0","c2"]""")
      // batch 1: two inserts
      Connectors.writeView(
        Seq((1L, 10L, "first", 1L), (2L, 20L, "second", 1L))
          .toDF("c0", "c1", "c2", ZSets.W), c)
      assert(srv.store.keySet === Set("1:first", "2:second"))
      assert(new String(srv.store("1:first"), UTF_8) ===
        """{"c0":1,"c1":10,"c2":"first"}""" + "\n")

      // batch 2: update key 1 (delete+insert pair), delete key 2
      Connectors.writeView(
        Seq((1L, 10L, "first", -1L), (1L, 11L, "first", 1L),
          (2L, 20L, "second", -1L))
          .toDF("c0", "c1", "c2", ZSets.W), c)
      assert(srv.store.keySet === Set("1:first"))
      assert(new String(srv.store("1:first"), UTF_8) ===
        """{"c0":1,"c1":11,"c2":"first"}""" + "\n")
      assert(srv.execCount.get() === 2)
    } finally srv.close()
  }

  test("key_separator joins composite keys; weight-less views lift") {
    val srv = new RedisStubServer()
    try {
      Connectors.writeView(
        Seq((7L, 1L, "x")).toDF("c0", "c1", "c2"),
        conf(srv.port, """["c0","c1"]""", sep = "|"))
      assert(srv.store.keySet === Set("7|1"))
    } finally srv.close()
  }

  test("duplicate key in one delta raises (uniqueness enforced)") {
    val srv = new RedisStubServer()
    try {
      val err = intercept[Exception] {
        Connectors.writeView(
          Seq((1L, 1L, "a", 1L), (1L, 2L, "a", 1L))
            .toDF("c0", "c1", "c2", ZSets.W),
          conf(srv.port, """["c0","c2"]"""))
      }
      assert(graft.TestErrors.messageChain(err)
        .exists(_.contains("not unique")))
      assert(srv.store.isEmpty)
    } finally srv.close()
  }

  test("AUTH handshake from the connection string") {
    val srv = new RedisStubServer(requirePass = Some("hunter2"))
    try {
      Connectors.writeView(
        Seq((1L, 1L, "a", 1L)).toDF("c0", "c1", "c2", ZSets.W),
        conf(srv.port, """["c0"]""", auth = ":hunter2@"))
      assert(srv.store.keySet === Set("1"))
      // and a wrong password fails loudly
      val err = intercept[Exception] {
        Connectors.writeView(
          Seq((2L, 1L, "a", 1L)).toDF("c0", "c1", "c2", ZSets.W),
          conf(srv.port, """["c0"]""", auth = ":wrong@"))
      }
      assert(graft.TestErrors.messageChain(err)
        .exists(_.toLowerCase.contains("auth")))
    } finally srv.close()
  }

  test("a large delta streams through one transaction without " +
      "deadlocking on reply backpressure") {
    val srv = new RedisStubServer()
    try {
      val n = 20000
      Connectors.writeView(
        spark.range(n).select(col("id").as("c0"),
          (col("id") * 2).as("c1"), lit(1L).as(ZSets.W)),
        conf(srv.port, """["c0"]"""))
      assert(srv.store.size === n)
      assert(srv.execCount.get() === 1)
    } finally srv.close()
  }

  test("connection-string parsing covers the documented shapes") {
    assert(Redis.parseConnectionString("redis://localhost") ===
      Redis.Target("localhost", 6379, 0, None, None))
    assert(Redis.parseConnectionString("redis://127.0.0.1:6380/2") ===
      Redis.Target("127.0.0.1", 6380, 2, None, None))
    assert(Redis.parseConnectionString("redis://u:p@h:1/3") ===
      Redis.Target("h", 1, 3, Some("u"), Some("p")))
    assert(Redis.parseConnectionString("redis://:p@h") ===
      Redis.Target("h", 6379, 0, None, Some("p")))
    intercept[Exception](Redis.parseConnectionString("http://h"))
  }
}
