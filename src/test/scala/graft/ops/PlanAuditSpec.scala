package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** Physical-plan audits for the headline queries: the scale properties
  * claimed in SURVEY.md §8 (broadcast dimensions, parquet filter/column
  * pushdown, bounded exchange counts) asserted against the actual
  * executed plans, so a regression that silently introduces a
  * sort-merge join or a full-column scan fails CI, not a 100 TB run.
  */
class PlanAuditSpec extends SparkSpec {

  private def executed(df: DataFrame) = {
    // execute THIS frame so AQE finalizes the inspected plan (count()
    // would run a separate QueryExecution and leave this one initial)
    df.collect()
    df.queryExecution.executedPlan
  }

  private def collectNodes(df: DataFrame): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val root = executed(df)
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
    walk(root)
    out.toSeq
  }

  test("q05 5-way star join: every join is broadcast; fact table never shuffles for a join") {
    val nodes = collectNodes(Relational.q05.build(spark, sfDir))
    val smj = nodes.count(_.isInstanceOf[SortMergeJoinExec])
    val bhj = nodes.count(_.isInstanceOf[BroadcastHashJoinExec])
    assert(smj == 0, s"sort-merge join crept into the star join")
    assert(bhj == 5, s"expected 5 broadcast joins, got $bhj")
  }

  test("q02 selective filter reaches the parquet scan (PushedFilters)") {
    val scans = collectNodes(Relational.q02.build(spark, sfDir))
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val pushed = scans.flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("GreaterThan") || pushed.contains("EqualTo"),
      s"no selective filter pushed: $pushed")
  }

  test("q67 sampling reads only (source, doc_id) — text column pruned from the scan") {
    val scans = collectNodes(Extended.q67.build(spark, sfDir))
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val schema = scans.map(_.requiredSchema.fieldNames.toSet).reduce(_ ++ _)
    assert(!schema.contains("text"),
      s"sampling query reads the text blob it never uses: $schema")
    assert(schema == Set("source", "doc_id"))
  }

  test("q63 pivot: fact table crosses one exchange pre-aggregated; later stages are group-sized") {
    val nodes = collectNodes(Extended.q63.build(spark, sfDir))
    // pivot lowers to two stacked aggregations — (linestatus, returnflag)
    // partial+final, then PivotFirst over the ~6 group rows — plus the
    // final orderBy: 3 exchanges, but only the FIRST moves fact-table
    // data, and partial aggregation shrinks that to one row per
    // (partition, group) before the wire.
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
    assert(shuffles <= 3, s"pivot plan has $shuffles exchanges")
    val aggs = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec])
    assert(aggs >= 2, s"expected partial+final hash agg, got $aggs")
  }

  test("kNN brute force: query side is a broadcast, corpus side streams (no corpus shuffle before scoring)") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding").cast("array<double>").as("v"))
    val knn = Similarity.bruteForceKnn(
      emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5).toDF("qid", "qv"),
      emb, k = 3)
    val nodes = collectNodes(knn)
    val bcast = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec])
    assert(bcast == 1, "expected one broadcast nested-loop join for queries x corpus")
  }

  test("LSH ANN and embedding dedup plans contain no ScalaUDF (bucketing is codegen)") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding").cast("array<double>").as("v"))
    val knn = Similarity.lshKnn(spark, emb,
      emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5), k = 3)
    val dedup = Dedup.dedupByEmbedding(spark, emb, threshold = 0.95)
    for ((name, df) <- Seq("lshKnn" -> knn, "dedupByEmbedding" -> dedup)) {
      val udfs = collectNodes(df).flatMap(_.expressions).flatMap(_.collect {
        case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
      })
      assert(udfs.isEmpty, s"$name plan contains ScalaUDF: $udfs")
    }
  }

  test("q49 boilerplate removal strikes chunks via a broadcast anti-join") {
    val nodes = collectNodes(CurationOps.q49.build(spark, sfDir))
    // the df-thresholded boilerplate set is heavy-hitter-sized: the
    // removal join must be a broadcast (LeftAnti BroadcastHashJoin),
    // never a sort-merge of the full chunk stream
    val smj = nodes.count(_.isInstanceOf[SortMergeJoinExec])
    val antiBhj = nodes.collect {
      case j: BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(smj == 0, "boilerplate anti-join degraded to sort-merge")
    assert(antiBhj.nonEmpty, "expected a broadcast left-anti join")
  }

  test("nearest-center assignment is a pure map: zero exchanges") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("vec_id").as("id"),
        org.apache.spark.sql.functions.col("embedding").cast("array<double>").as("vec"))
    val centers = Array.tabulate(4, 8)((i, j) => (i * 8 + j + 1).toDouble)
    val assigned = graft.cluster.KMeansAssign.assignMap(emb, centers)
    val shuffles = collectNodes(assigned).count(_.isInstanceOf[ShuffleExchangeLike])
    assert(shuffles == 0, "broadcast-map assignment must not shuffle the points")
  }
}
