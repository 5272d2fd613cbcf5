package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation — the web-graph half of a
  * pre-training pipeline (domain ranking a la Common Crawl's harmonic
  * centrality / OPIC lists). PageRank here is INTEGER-EXACT: ranks are
  * BIGINTs scaled by 1e12 and every step is integer division (`div` on
  * Spark, `//` on DuckDB — proven to agree on non-negative operands by
  * the q119 precedent), so a fixed iteration count is bit-identical
  * across engines and across partitionings (BIGINT sums are
  * order-independent, unlike float PageRank).
  *
  * Scale: each iteration is one shuffle (contributions grouped by
  * dst) plus one broadcast-able join of the rank vector (node-sized,
  * not edge-sized) against the edge list. The edge list is the only
  * corpus-sized table and is hash-partitioned ONCE on src — every
  * iteration's rank join reuses that partitioning, so the per-iter
  * cost is the dst-side exchange of the contribution table. No
  * driver-side state: the rank vector never leaves the cluster.
  */
object Graph {

  /** Initial per-node rank and the 0.15/0.85 damping, in 1e-12 units:
    * r0 = 1.0, teleport = 0.15, damp = 17/20 applied as (17*x) div 20.
    */
  val RankScale = 1000000000000L
  val Teleport = 150000000000L

  /** Supplier node-id offset into the shared id space. 10^9, not the
    * former 10^7: TPC-H custkey runs to 150,000·SF, so a 10^7 offset
    * collides customer and supplier NODES at SF >= 67 — silently
    * merging two real nodes' degree and rank mass, and the twin
    * (hardcoding the same literal) would reproduce rather than detect
    * it. 10^9 holds to SF ~6,666 (≈ petabyte-scale TPC-H), past the
    * design envelope. Single definition, interpolated into the twin.
    */
  val SupplierOffset = 1000000000L

  /** Undirected customer-supplier trade graph: an edge per distinct
    * (customer, supplier) pair that traded (orders x lineitem),
    * materialized in both directions so every node has out-degree >= 1
    * (no dangling-mass bookkeeping). Suppliers live at
    * id+[[SupplierOffset]] to keep one id space.
    */
  def tradeEdges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val pairs = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + lit(SupplierOffset)).as("supp"))
      .distinct()
    pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionByName(pairs.select(col("supp").as("src"), col("cust").as("dst")))
  }

  /** Fixed-iteration integer PageRank over a directed edge list where
    * every node has at least one out-edge:
    * r_{t+1}(v) = teleport + (17 * sum_{u->v} (r_t(u) div outdeg(u))) div 20.
    * Floor division loses < 1e-12 per term — the price of bit-exact
    * determinism. Returns (node, rank) with rank in 1e-12 units.
    */
  /** Node-count ceiling for broadcasting the rank vector: ~16 bytes a
    * row keeps an 8M-node vector near 128 MB — the conventional
    * broadcast budget. Above it, iterations fall back to shuffled
    * joins against the src-partitioned edge cache (only the node-sized
    * rank side moves; the edge list never re-shuffles).
    */
  val BroadcastNodeLimit = 8000000L

  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    // Loop-invariant frames, persisted ONCE each: the edge list (the
    // only corpus-sized table — disk spillover; at cluster scale this
    // is the standard iterative-graph pattern, e.g. GraphX's edge
    // cache) and the node-sized out-degree table. The node set is NOT
    // a separate distinct pass — the distinct src set IS out's key
    // set. One cold action (out.count, which pulls eRaw through its
    // cache on the way) materializes both caches AND evaluates the
    // broadcast guard; the r7 shape paid the edge-build subtree
    // (scan + join + distinct + repartition) twice more cold — once
    // under nodes.distinct().count(), once under a persisted
    // edge+degree join frame (bench isolation unpersists between reps,
    // so every recorded rep paid that cold path: 7.7s recorded vs 3.3s
    // warm at sf0.1 x 5 iters).
    val eRaw = edges
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = eRaw.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bcastRanks = out.count() <= BroadcastNodeLimit
    // Src-partitioning the edge cache only pays off on the
    // non-broadcast fallback, where per-iteration shuffled joins meet
    // the edges in place. On the broadcast path the edge partitions
    // are streamed as-is, so the edge-sized repartition exchange would
    // be pure cold-start cost (~edge-table wire volume for nothing);
    // the degree groupBy above is map-side combined either way, so its
    // exchange is node x partition sized, not edge sized.
    val e =
      if (bcastRanks) eRaw
      else {
        val r = eRaw.repartition(col("src"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        r.queryExecution.toRdd.count()
        eRaw.unpersist(blocking = false)
        r
      }
    val nodes = out.select(col("src").as("node"))
    // The rank vector is node-sized, orders of magnitude smaller than
    // the edge list. When it fits the broadcast budget, ship it to the
    // executors each iteration: a broadcast-hash join streams the
    // cached edge partitions with NO per-iteration sort or exchange of
    // the edge-sized side (a sort-merge join would re-sort |E| rows
    // every iteration — measured 7.7s -> 2.6s at sf0.1 x 5 iters).
    // Above the budget, iterations degrade to shuffled joins where
    // only the node-sized side moves: rankDeg exchanges on src and
    // meets the cached, already-src-partitioned edge list in place.
    def hinted(df: DataFrame): DataFrame = if (bcastRanks) broadcast(df) else df
    var ranks = nodes.select(col("node"), lit(RankScale).as("rank"))
    for (_ <- 1 to iters) {
      // Per-node contribution rank div outdeg computed BEFORE touching
      // the edges (node-sized join + one division per node, not per
      // edge), then fanned out across the cached edge partitions.
      val rankDeg = out
        .join(hinted(ranks.withColumnRenamed("node", "src")), "src")
        .select(col("src"), expr("rank div outdeg").as("c"))
      val contrib = e.join(hinted(rankDeg), "src")
        .select(col("dst").as("node"), col("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("insum"))
      // damping (17x) div 20 DECOMPOSED as 17*(x div 20) + (17*(x mod 20)) div 20:
      // identical for x >= 0 (x = 20q + r => both are 17q + (17r) div 20) but
      // never forms 17*x, which overflows Long once a hub's in-sum passes
      // Long.MaxValue/17 (~7% of total mass at the 8M-node broadcast limit)
      // EAGER checkpoint, one small job per iteration. The former lazy
      // form deferred all five to the final action, where each
      // iteration's broadcast build is its own Spark job and block
      // reuse across those jobs is a RACE: a broadcast subtree that
      // started before the previous iteration's checkpoint blocks
      // landed re-executed the whole lineage below it, compounding
      // across iterations (measured at sf0.1: 5-56s per run lazy, with
      // the spread driven by which blocks won the race, vs a stable
      // ~0.1s per-iteration materialization eager — phase-probed, see
      // PLANS.md q131). Eager serializes the iterations the way a
      // cluster PageRank does anyway: iteration t+1 cannot start
      // before t's vector exists.
      ranks = nodes.join(hinted(contrib), Seq("node"), "left")
        .select(col("node"),
          (lit(Teleport) +
            expr("17 * (coalesce(insum, 0L) div 20) + (17 * (coalesce(insum, 0L) % 20)) div 20"))
            .as("rank"))
        .localCheckpoint(eager = true)
    }
    ranks
  }

  def all: Seq[QueryDef] = Seq(q131)

  private val IterN = 5

  /** q131: 5-iteration integer PageRank over the trade graph, top-25
    * nodes. The DuckDB twin unrolls the iterations as CTEs r0..r5 with
    * the identical integer formula — BIGINT sums and floor division
    * make the replay exact, no float discipline needed. Rank the
    * curation analogue: which domains/sources sit central in the link
    * graph and deserve crawl/quality budget.
    */
  val q131: QueryDef = {
    val iterCtes = (1 to IterN).map { t =>
      s"""r$t AS (
         |  SELECT n.node,
         |    CAST($Teleport + 17 * (COALESCE(s.insum, 0) // 20)
         |      + (17 * (COALESCE(s.insum, 0) % 20)) // 20 AS BIGINT) AS rank
         |  FROM nodes n
         |  LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(sum(r.rank // o.outdeg) AS BIGINT) AS insum
         |    FROM edges e
         |    JOIN r${t - 1} r ON e.src = r.node
         |    JOIN outd o ON e.src = o.src
         |    GROUP BY e.dst) s ON s.node = n.node)""".stripMargin
    }.mkString(",\n       |")
    QueryDef.sql(
      "q131_pagerank",
      s"""WITH pairs AS (
         |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey + $SupplierOffset AS supp
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |edges AS (
         |  SELECT cust AS src, supp AS dst FROM pairs
         |  UNION ALL
         |  SELECT supp AS src, cust AS dst FROM pairs),
         |outd AS (
         |  SELECT src, CAST(count(*) AS BIGINT) AS outdeg
         |  FROM edges GROUP BY src),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |r0 AS (SELECT node, CAST($RankScale AS BIGINT) AS rank FROM nodes),
         |$iterCtes
         |SELECT node, rank FROM r$IterN
         |ORDER BY rank DESC, node LIMIT 25""".stripMargin) { (s, dir) =>
      val ranks = pageRank(
        tradeEdges(Tables.orders(s, dir), Tables.lineitem(s, dir)), IterN)
      ranks.orderBy(col("rank").desc, col("node")).limit(25)
    }
  }
}
