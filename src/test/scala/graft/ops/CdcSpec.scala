package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val snap = Seq(
    (1L, "one", 10L), (2L, "two", 20L), (3L, "three", 30L))
    .toDF("id", "text", "n")

  test("applyCdc: insert, update, delete in one delta") {
    val delta = Seq[(Long, String, java.lang.Long, String, Long)](
      (2L, "TWO", 21L, "U", 1L),   // update existing
      (4L, "four", 40L, "I", 1L),  // insert new key
      (3L, null, null, "D", 1L))   // delete existing
      .toDF("id", "text", "n", "op", "seq")
      .select(col("id"), col("text"), col("n").cast("long").as("n"),
        col("op"), col("seq"))
    val out = Cdc.applyCdc(snap, delta, "id", "op", Some("seq"))
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "one", 10L), (2L, "TWO", 21L), (4L, "four", 40L)))
  }

  test("junk change rows (NULL op / NULL key) are dropped, never mutate state") {
    val delta = Seq[(java.lang.Long, String, java.lang.Long, String, Long)](
      (5L, "junk-op", 50L, null, 1L),   // NULL op: used to DELETE key 5
      (null, "junk-key", 60L, "I", 1L)) // NULL key: used to insert a phantom row
      .toDF("id", "text", "n", "op", "seq")
      .select(col("id").cast("long").as("id"), col("text"),
        col("n").cast("long").as("n"), col("op"), col("seq"))
    val snap5 = snap.unionByName(Seq((5L, "five", 50L)).toDF("id", "text", "n"))
    val out = Cdc.applyCdc(snap5, delta, "id", "op", Some("seq"))
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    // snapshot unchanged: key 5 retained, no null-key phantom
    assert(out == Seq((1L, "one", 10L), (2L, "two", 20L),
      (3L, "three", 30L), (5L, "five", 50L)))
  }

  test("latest sequence wins per key; delete beats upsert on a tie") {
    val delta = Seq[(Long, String, java.lang.Long, String, Long)](
      (1L, "old", 11L, "U", 1L),
      (1L, "new", 12L, "U", 5L),   // wins: highest seq
      (2L, "back", 22L, "U", 3L),
      (2L, null, null, "D", 3L))   // same seq as the upsert: delete wins
      .toDF("id", "text", "n", "op", "seq")
      .select(col("id"), col("text"), col("n").cast("long").as("n"),
        col("op"), col("seq"))
    val out = Cdc.applyCdc(snap, delta, "id", "op", Some("seq"))
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "new", 12L), (3L, "three", 30L)))
  }

  test("delete of a missing key is a no-op; empty delta is identity") {
    val delta = Seq((99L, null: String, null: java.lang.Long, "D", 1L))
      .toDF("id", "text", "n", "op", "seq")
      .select(col("id"), col("text"), col("n").cast("long").as("n"),
        col("op"), col("seq"))
    assert(Cdc.applyCdc(snap, delta, "id").count() == 3)
    val empty = delta.filter(lit(false))
    val out = Cdc.applyCdc(snap, empty, "id", "op", Some("seq"))
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "one", 10L), (2L, "two", 20L), (3L, "three", 30L)))
  }

  test("snapshot side joins with a broadcast anti join when the delta " +
    "is small (the snapshot never shuffles)") {
    val delta = Seq((2L, "TWO", 21L, "U", 1L))
      .toDF("id", "text", "n", "op", "seq")
      .select(col("id"), col("text"), col("n").cast("long").as("n"),
        col("op"), col("seq"))
    val out = Cdc.applyCdc(snap, delta, "id", "op", Some("seq"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti join:\n$plan")
  }
}
