package graft.ops

import org.apache.spark.sql.functions._

/** Rows-only queries — the remaining operators whose semantics depend
  * on engine-internal hashing (xxhash64 MinHash/SimHash, sign-LSH
  * planes, HLL/quantile sketches) or on iterative driver loops (IVF's
  * Lloyd quantizer), which no single ANSI-SQL statement reproduces.
  * Correctness for these comes from the unit and golden tests in
  * src/test (plus oracle-checked arithmetic twins: q27/q28/q29 for
  * MinHash/LSH/SimHash, q31 for exact kNN); the driver records a
  * rows>0 check.
  */
object NonOracle {

  def all: Seq[QueryDef] = Seq(
    q45, q46, q47, q51, q52, q53, q57, q102, q105, q106)
  /** Production MinHash-LSH near-dup candidates (xxhash64 path). */
  val q45 = QueryDef.rowsOnly("q45_minhash_lsh_prod") { (s, dir) =>
    Dedup.minhashCandidates(Tables.documents(s, dir).filter(col("doc_id") < 500))
      .orderBy(col("d1"), col("d2"))
  }

  /** SimHash near-dup pairs via the codegen'd simhash64 expression. */
  val q46 = QueryDef.rowsOnly("q46_simhash_pairs") { (s, dir) =>
    Dedup.simhashPairs(Tables.documents(s, dir).filter(col("doc_id") < 500))
      .orderBy(col("d1"), col("d2"))
  }

  /** Sign-LSH approximate nearest neighbors (bucketed cosine top-3). */
  val q47 = QueryDef.rowsOnly("q47_knn_lsh") { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    Similarity.lshKnn(s, emb, emb.filter(col("vec_id") < 10), k = 3, nPlanes = 6)
      .orderBy(col("qid"), col("rnk"))
  }


  /** Production embedding dedup: LSH-bucketed cosine, keep-lowest-id. */
  val q51 = QueryDef.rowsOnly("q51_embedding_dedup_prod") { (s, dir) =>
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    Dedup.dedupByEmbedding(s, e, threshold = 0.35, nPlanes = 8)
      .select(col("vec_id")).orderBy(col("vec_id"))
  }

  /** Approximate sketches: HLL distinct + approx quantiles per flag
    * (engine-specific sketch internals -> no oracle).
    */
  val q52 = QueryDef.rowsOnly("q52_approx_sketches") { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("median_price"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000))
          .as("p99_price"))
      .orderBy(col("l_returnflag"))
  }

  /** IVF ANN: k-means coarse quantizer + probe-limited exact search. */
  val q53 = QueryDef.rowsOnly("q53_knn_ivf") { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    Similarity.ivfKnn(s, emb, emb.filter(col("vec_id") < 10), k = 3,
      nCells = 8, nProbe = 3, lloydIters = 1)
      .orderBy(col("qid"), col("rnk"))
  }


  /** IVF-PQ ANN: coarse cells + product-quantized ADC shortlist +
    * exact re-rank (graft.ops.Pq). Accuracy proven by PqSpec's
    * recall-vs-brute-force gate; rows-only here (ranking depends on
    * trained codebooks).
    */
  val q102 = QueryDef.rowsOnly("q102_knn_ivfpq") { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    Pq.ivfPqKnn(s, emb, emb.filter(col("vec_id") < 10), k = 3,
      nCells = 8, nProbe = 3, rerank = 24, lloydIters = 1)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Incremental distinct-token stats via mergeable HLL state
    * (graft.ops.Sketches): history sketched once (doc_id < 300), the
    * delta batch sketched separately, states merged register-wise —
    * emitted beside the full-rebuild estimate, which it must equal
    * row for row (SketchMergeSpec asserts it; sketch internals are
    * engine-specific, so rows-only at the oracle).
    */
  val q106 = QueryDef.rowsOnly("q106_sketch_merge") { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("source"), explode(TextAnalytics.toks(col("text"))).as("term"),
        col("doc_id"))
    val hist = Sketches.distinctSketch(docs.filter(col("doc_id") < 300), "source", "term")
    val delta = Sketches.distinctSketch(docs.filter(col("doc_id") >= 300), "source", "term")
    val merged = Sketches.estimates(
      Sketches.mergeSketchStates(hist, delta, "source"), "source")
      .withColumnRenamed("n_distinct", "est_incremental")
    val full = Sketches.estimates(
      Sketches.distinctSketch(docs, "source", "term"), "source")
      .withColumnRenamed("n_distinct", "est_rebuild")
    merged.join(full, "source").orderBy(col("source"))
  }

  /** Distributed BPE tokenizer training (graft.ops.Bpe): 20 merges
    * learned over the word-type table of the first 500 docs, emitted
    * as the ranked merge list. Iterative driver-argmax loop — not
    * SQL-expressible; semantics gated by BpeSpec (the Sennrich
    * worked example reproduces exactly).
    */
  val q105 = QueryDef.rowsOnly("q105_bpe_train") { (s, dir) =>
    val words = Bpe.wordFreqs(Tables.documents(s, dir).filter(col("doc_id") < 500))
    val merges = Bpe.train(words, nMerges = 20)
    import s.implicits._
    merges.zipWithIndex
      .map { case ((a, b), r) => (r.toLong, a, b) }
      .toDF("rank", "left", "right")
  }

  /** Full multimodal pipeline: attach media -> (stub) embed -> exact
    * duplicate detection via embedding kNN. Identical payloads produce
    * identical embeddings, so exact dups surface at similarity 1.
    */
  val q57 = QueryDef.rowsOnly("q57_multimodal_embed_knn") { (s, dir) =>
    val emb = Multimodal.embedStub(s,
      Multimodal.attachMedia(Tables.documents(s, dir)))
      .toDF("vec_id", "v")
    Similarity.bruteForceKnn(
      emb.filter(col("vec_id") < 10).toDF("qid", "qv"), emb, k = 3)
      .orderBy(col("qid"), col("rnk"))
  }
}
