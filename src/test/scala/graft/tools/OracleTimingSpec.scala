package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-COST regression guard's anti-rot check: the committed
  * timing sidecar (`tools/ORACLE_TIMING.json`, written by
  * `tools/check_oracle.py`) must cover EVERY registered oracle and
  * carry no over-budget entries. Without the freshness half, a new
  * oracle could land next to a stale sidecar and its DuckDB cost
  * would again be discoverable only by a driver timeout — the exact
  * r12 q199 failure mode (782 s, zeroed CORRECTNESS artifact) the
  * sidecar exists to prevent. Failing here means: run the full
  * `graft.Verify` + `tools/check_oracle.py` gate and commit the
  * refreshed sidecar.
  *
  * Parsed with a real JSON parser (json4s, on Spark's classpath) —
  * the earlier regex probe depended on check_oracle.py's exact
  * json.dump formatting, so a harmless serializer change could flip
  * the guard either way.
  */
class OracleTimingSpec extends AnyFunSuite {

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private lazy val root: JValue = JsonMethods.parse(new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/ORACLE_TIMING.json")), "UTF-8"))

  test("sidecar covers every registered oracle by name (freshness)") {
    val timed = root \ "per_query_s" match {
      case JObject(fields) => fields.map(_._1).toSet
      case other => fail(s"per_query_s is not an object: $other")
    }
    val missing = graft.SparkEntry.oracleSql.keySet -- timed
    assert(missing.isEmpty,
      s"oracles missing from the committed sidecar: " +
        s"${missing.toSeq.sorted.mkString(", ")} — re-run the full " +
        "check_oracle.py gate and commit tools/ORACLE_TIMING.json")
    // BOTH directions: a deleted/renamed oracle's stale entry must
    // also fail (the old count==count check caught this; a one-way
    // subset check would not)
    val stale = timed -- graft.SparkEntry.oracleSql.keySet
    assert(stale.isEmpty,
      s"sidecar entries for oracles no longer registered: " +
        s"${stale.toSeq.sorted.mkString(", ")} — re-run the gate")
  }

  test("no oracle over the DuckDB budget") {
    val over = root \ "over_budget" match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case other => fail(s"over_budget is not an array: $other")
    }
    assert(over.isEmpty,
      s"oracles over budget in the committed sidecar: " +
        over.sorted.mkString(", "))
  }
}
