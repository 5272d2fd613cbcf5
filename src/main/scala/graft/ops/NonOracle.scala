package graft.ops

import org.apache.spark.sql.functions._

/** Queries whose semantics depend on engine-internal hashing (xxhash64
  * MinHash/SimHash, sign-LSH planes, HLL/quantile sketches) or on
  * iterative driver loops (IVF's Lloyd quantizer), which no single
  * ANSI-SQL statement over the fixture tables reproduces. Most are
  * rows-only (the driver records a rows>0 check) with correctness from
  * the unit and golden tests in src/test plus oracle-checked arithmetic
  * twins (q27/q28/q29 for MinHash/LSH/SimHash, q31 for exact kNN).
  * q46 carries a TWO-STAGE oracle: Spark dumps its signature frame and
  * DuckDB re-derives the entire pair generation over it.
  */
object NonOracle {

  def all: Seq[QueryDef] = Seq(
    q45, q46, q47, q51, q52, q53, q57, q102, q105, q106)
  /** Production MinHash-LSH near-dup candidates (xxhash64 path). */
  val q45 = QueryDef.rowsOnly("q45_minhash_lsh_prod") { (s, dir) =>
    Dedup.minhashCandidates(Tables.documents(s, dir).filter(col("doc_id") < 500))
      .orderBy(col("d1"), col("d2"))
  }

  /** SimHash near-dup pairs via the codegen'd simhash64 expression.
    * TWO-STAGE ORACLE: xxhash64 has no DuckDB twin, but given the
    * signatures every downstream step is plain SQL — so graft.Verify
    * dumps the Spark-computed (doc_id, sig) frame as the
    * `aux_simhash_sig64` artifact (same doc slice) and substitutes the
    * output dir for `__GRAFT_OUT__` below; DuckDB then independently
    * re-derives band keys ((sig >> 16b) & 0xffff — the mask makes
    * arithmetic-vs-logical shift moot), the banded self-join, the
    * (d1,d2) distinct, and the hamming<=8 verify. The signature kernel
    * itself is gated by DedupRecallSpec + the q29 arithmetic twin.
    */
  val q46 = QueryDef.sql(
    "q46_simhash_pairs",
    """WITH s AS (
      |  SELECT doc_id, sig
      |  FROM read_parquet('__GRAFT_OUT__/aux_simhash_sig64/*.parquet')),
      |b AS (
      |  SELECT doc_id, sig, g.b AS b, ((sig >> (g.b * 16)) & 65535) AS band
      |  FROM s CROSS JOIN (SELECT unnest(range(4)) AS b) g),
      |p AS (
      |  SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2,
      |    a.sig AS s1, c.sig AS s2
      |  FROM b a JOIN b c
      |    ON a.b = c.b AND a.band = c.band AND a.doc_id < c.doc_id)
      |SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS INTEGER) AS hamming
      |FROM p WHERE bit_count(xor(s1, s2)) <= 8
      |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
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
