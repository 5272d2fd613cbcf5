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
  */
class OracleTimingSpec extends AnyFunSuite {

  private lazy val txt = new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/ORACLE_TIMING.json")), "UTF-8")

  test("sidecar covers every registered oracle (freshness)") {
    val n = """"n_oracles":\s*(\d+)""".r
      .findFirstMatchIn(txt).map(_.group(1).toInt)
    assert(n.contains(graft.SparkEntry.oracleSql.size),
      s"sidecar records $n oracles but the registry has " +
        s"${graft.SparkEntry.oracleSql.size} — re-run the full " +
        "check_oracle.py gate and commit tools/ORACLE_TIMING.json")
  }

  test("no oracle over the DuckDB budget") {
    val over = """"over_budget":\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(txt).map(_.group(1).trim)
    assert(over.contains(""),
      s"oracles over budget in the committed sidecar: $over")
  }
}
