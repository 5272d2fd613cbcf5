package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Global-sort audit (PLANS.md, "Sink sorts"): every oracle query ends
  * in a deterministic total order, but at 100 TB a global sort is a
  * range-sample pass plus a full-output exchange PER QUERY — so the
  * audit gates (a) that the largest-output queries pay at most ONE
  * range exchange (the sink sort itself, never a redundant mid-plan
  * global sort), and (b) the conversion pattern on q111: when the
  * final order keys extend the window's cluster keys, ONE up-front
  * range partition serves both the window and the total order, and the
  * second (range-sort) exchange disappears entirely.
  */
class SortAuditSpec extends SparkSpec {
  import spark.implicits._

  private def collectNodes(df: DataFrame): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    df.collect()
    val out = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.execution.SparkPlan]()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      out += p
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case _ => p.children.foreach(walk)
      }
    }
    walk(df.queryExecution.executedPlan)
    out.toSeq
  }

  private def rangeExchanges(nodes: Seq[org.apache.spark.sql.execution.SparkPlan]) =
    nodes.collect {
      case e: ShuffleExchangeLike
        if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
    }

  test("q111 debounce: one exchange total; range+local sort == global orderBy") {
    val df = Extended.q111.build(spark, sfDir)
    val nodes = collectNodes(df)
    val exchanges = nodes.collect { case e: ShuffleExchangeLike => e }
    assert(exchanges.size == 1,
      s"expected exactly 1 exchange (the up-front range partition), got ${exchanges.size}")
    assert(exchanges.head.outputPartitioning.isInstanceOf[RangePartitioning],
      s"the single exchange is not range: ${exchanges.head.outputPartitioning}")
    // the frame's natural (partition-index) order IS the total order
    val keys = df.select($"user_id", $"event_type", $"event_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(keys == keys.sorted, "range partitions + local sort lost global order")
    // and the content equals the plain global-sort formulation
    val twin = df.orderBy($"user_id", $"event_type", $"event_id")
      .as[(Long, String, Long, String)].collect().toSeq
    assert(df.as[(Long, String, Long, String)].collect().toSeq == twin)
  }

  /** The five largest-output oracle queries: the sink sort is the ONLY
    * global sort — a second range exchange would mean a mid-plan total
    * order feeding further computation, paid over corpus-sized data.
    */
  test("largest-output queries pay at most one global (range) sort") {
    val top = Seq("q46_simhash_pairs", "q28_lsh_candidates",
      "q75_fuzzy_pairs", "q111_event_debounce", "q06_topk_per_customer")
    val qs = graft.SparkEntry.queries
    top.foreach { name =>
      val ranges = rangeExchanges(collectNodes(qs(name)(spark, sfDir)))
      assert(ranges.size <= 1,
        s"$name: ${ranges.size} range exchanges — redundant global sort in the plan")
    }
  }
}
