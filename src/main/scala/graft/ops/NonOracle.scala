package graft.ops

import org.apache.spark.sql.functions._

/** Queries whose semantics depend on engine-internal hashing (xxhash64
  * MinHash/SimHash, sign-LSH planes, HLL/quantile sketches) or on
  * iterative driver loops (IVF's Lloyd quantizer), which no single
  * ANSI-SQL statement over the fixture tables reproduces. Where the
  * engine-internal kernel's OUTPUT is a deterministic frame, the query
  * carries a TWO-STAGE oracle instead of rows-only: graft.Verify dumps
  * that frame (ops.AuxArtifacts) and DuckDB independently re-derives
  * every downstream step over it — banding + pair generation for
  * q45/q46, probe fan-out + candidate join + exact scoring + ranking
  * for q47, threshold dedup for q51, the full brute-force kNN for q57.
  * The kernels themselves are gated by unit/recall specs plus the
  * oracle-checked arithmetic twins (q27/q28/q29 for MinHash/LSH/
  * SimHash, q31 for exact kNN). Still rows-only: q52 ONLY — its
  * estimates come from Spark's engine-internal datasketches binaries
  * (approx_count_distinct / percentile_approx), whose register layout
  * and compaction no other engine replays; its auditable twins are
  * q128 (HLL) / q130 (CMS) / q106 (mergeable HLL state), all
  * hash-checked.
  */
object NonOracle {

  def all: Seq[QueryDef] = Seq(
    q45, q46, q47, q51, q52, q53, q57, q102, q105, q106, q128, q130, q153,
    q160, q170, q173, q177, q188, q196, q200, q204, q206, q212)

  // the shared twin cosine fragments (single definition: TwinSql)
  // every twin in this file SCORES vectors, so only the zero-norm
  // guarded form is aliased (an unguarded alias here once invited a
  // divide-by-zero pick-up by mistake)
  private def cosSqlZ(a: String, b: String): String = TwinSql.cosZ(a, b)

  /** The q188/q200/q206 planted-eval operating point the REGISTERED oracle
    * twins are instantiated at; the Scala entry points default to the
    * same values, and the twin fragments interpolate whatever they
    * are handed — so a non-default call site gets a matching chain
    * instead of silently diverging from a hardcoded 5/10.
    */
  private[ops] val EvalNQ = 5
  private[ops] val EvalK = 10
  /** Query terms per eval query: each planted query is its doc's
    * top-EvalNTerms terms by (tf desc, term) — the third leg of the
    * shared eval operating point next to EvalNQ/EvalK.
    */
  private[ops] val EvalNTerms = 4


  /** Production MinHash-LSH near-dup candidates (xxhash64 path).
    * TWO-STAGE ORACLE: Verify dumps the signature matrix
    * (aux_minhash_sig32); DuckDB re-derives the 8 band slices and the
    * banded self-join, grouping on the RAW 4-long slice where Spark
    * equi-joins on xxhash64 of it — identical pair sets barring a
    * 64-bit hash collision between unequal slices (which would only
    * ADD a Spark pair, and is detected, not masked, by the compare).
    */
  val q45 = QueryDef.sql(
    "q45_minhash_lsh_prod",
    """WITH s AS (
      |  SELECT doc_id, list(h ORDER BY pos) AS mh
      |  FROM read_parquet('__GRAFT_OUT__/aux_minhash_sig32/*.parquet')
      |  GROUP BY doc_id),
      |b AS (
      |  SELECT doc_id, g.b AS band, list_slice(mh, g.b*4 + 1, g.b*4 + 4) AS key
      |  FROM s CROSS JOIN (SELECT unnest(range(8)) AS b) g)
      |SELECT a.doc_id AS d1, c.doc_id AS d2
      |FROM b a JOIN b c ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
      |GROUP BY d1, d2
      |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    Dedup.minhashCandidates(Tables.documents(s, dir).filter(col("doc_id") < 500))
      .orderBy(col("d1"), col("d2"))
  }

  /** Auditable MinHash (q153): per-candidate-pair calibration of the
    * signature-estimated Jaccard against the EXACT 3-shingle-set
    * Jaccard — the q128/q130 auditable-sketch discipline applied to
    * the dedup pipeline's own approximation. The operational question
    * it answers: "are 32 permutations enough at our dedup threshold,
    * and is the banding's candidate set biased?" — est_j is what the
    * pipeline acts on, exact_j is the truth, and abs_err is the
    * per-pair audit a threshold-tuning pass aggregates.
    *
    * Scale: candidates come from the q45 banded equi-join (never
    * all-pairs); signatures join back per-candidate on doc_id; the
    * exact intersection joins candidate pairs to the per-doc distinct
    * shingle rows keyed (doc, shingle-hash) — all work is
    * candidate-bounded, and the shingle exchange ships 8-byte
    * xxhash64 keys (q136's argument: a collision would surface in the
    * compare, not hide). TWO-STAGE ORACLE: DuckDB re-derives bands,
    * candidate pairs, and slot-match counts from the dumped signature
    * matrix (aux_minhash_sig32), and the exact Jaccard from raw
    * shingle strings; est/exact/abs_err formulas are literal-identical
    * on both sides.
    */
  val q153 = QueryDef.sql(
    "q153_minhash_calibration",
    """WITH s AS (
       |  SELECT doc_id, list(h ORDER BY pos) AS mh
       |  FROM read_parquet('__GRAFT_OUT__/aux_minhash_sig32/*.parquet')
       |  GROUP BY doc_id),
       |b AS (
       |  SELECT doc_id, g.b AS band, list_slice(mh, g.b*4 + 1, g.b*4 + 4) AS key
       |  FROM s CROSS JOIN (SELECT unnest(range(8)) AS b) g),
       |cand AS (
       |  SELECT a.doc_id AS d1, c.doc_id AS d2
       |  FROM b a JOIN b c ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
       |  GROUP BY d1, d2),
       |m AS (
       |  SELECT cand.d1, cand.d2,
       |    CAST(len(list_filter(range(1, 33), i -> s1.mh[i] = s2.mh[i])) AS BIGINT)
       |      AS n_match
       |  FROM cand JOIN s s1 ON s1.doc_id = cand.d1
       |            JOIN s s2 ON s2.doc_id = cand.d2),
       |d AS (
       |  SELECT doc_id, t, len(t) AS n
       |  FROM (SELECT doc_id,
       |          list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'), x -> x <> '') AS t
       |        FROM documents WHERE doc_id < 500)
       |  WHERE len(t) > 0),
       |sh AS (
       |  SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS sg
       |  FROM (SELECT doc_id, t, unnest(range(0, greatest(n - 3, 0) + 1)) AS i
       |        FROM d)),
       |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c FROM sh GROUP BY doc_id),
       |iv AS (
       |  SELECT m2.d1, m2.d2, CAST(count(*) AS BIGINT) AS inter
       |  FROM m m2 JOIN sh a ON a.doc_id = m2.d1
       |            JOIN sh b2 ON b2.doc_id = m2.d2 AND b2.sg = a.sg
       |  GROUP BY m2.d1, m2.d2)
       |SELECT m.d1, m.d2, m.n_match,
       |  CAST(m.n_match AS DOUBLE) / 32.0 AS est_j,
       |  CAST(COALESCE(iv.inter, 0) AS BIGINT) AS n_inter,
       |  CAST(c1.c + c2.c - COALESCE(iv.inter, 0) AS BIGINT) AS n_union,
       |  CAST(COALESCE(iv.inter, 0) AS DOUBLE)
       |    / CAST(c1.c + c2.c - COALESCE(iv.inter, 0) AS DOUBLE) AS exact_j,
       |  abs(CAST(m.n_match AS DOUBLE) / 32.0
       |    - CAST(COALESCE(iv.inter, 0) AS DOUBLE)
       |      / CAST(c1.c + c2.c - COALESCE(iv.inter, 0) AS DOUBLE)) AS abs_err
       |FROM m JOIN cnt c1 ON c1.doc_id = m.d1
       |       JOIN cnt c2 ON c2.doc_id = m.d2
       |       LEFT JOIN iv ON iv.d1 = m.d1 AND iv.d2 = m.d2
       |ORDER BY m.d1, m.d2""".stripMargin) { (s, dir) =>
    NonOracle.minhashCalibration(
      Tables.documents(s, dir).filter(col("doc_id") < 500))
      .orderBy(col("d1"), col("d2"))
  }

  /** The q153 kernel over any (doc_id, text) frame; unsorted output.
    * Docs with no tokens drop out (no shingle set to audit).
    *
    * The signature kernel runs over the corpus ONCE: the (doc_id, mh)
    * frame is lazily localCheckpoint'd (the Dedup.scala:208 idiom), so
    * the band derivation (both sides of the candidate self-join) and
    * the two per-candidate signature joins all reuse the materialized
    * partitions instead of re-running shingle_minhash — naively this
    * kernel costs 4+ corpus passes of the hash loop.
    */
  def minhashCalibration(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    calibrationAudit(
      Dedup.minhashSignatures(docs).localCheckpoint(false),
      docs.select(col("doc_id"),
          explode(array_distinct(Dedup.shingles(col("text"), 3))).as("sg"))
        .select(col("doc_id"), xxhash64(col("sg")).as("sh")))

  /** The shared q153/q212 calibration core: given a CHECKPOINTED
    * (doc_id, mh) signature frame and a (doc_id, sh) hashed distinct
    * gram frame, derive banded candidates (bands via the ONE
    * Dedup.bandsFromSignatures derivation, the join via the ONE
    * Dedup.candidatesFromBands definition), per-pair slot-match
    * estimates, the exact gram-set Jaccard, and abs_err. ONE
    * definition for both the word and char audits — a formula fix
    * applied to one copy must not leave the other auditing a
    * different criterion.
    */
  private def calibrationAudit(sig: org.apache.spark.sql.DataFrame,
                               shg: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cand = Dedup.candidatesFromBands(Dedup.bandsFromSignatures(sig))
    val cnt = shg.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("bigint").as("c"))
    val inter = cand
      .join(shg.toDF("d1", "sh"), Seq("d1"))
      .join(shg.toDF("d2", "sh"), Seq("d2", "sh"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).cast("bigint").as("inter"))
    val estJ = col("n_match").cast("double") / lit(32.0)
    val exactJ = coalesce(col("inter"), lit(0L)).cast("double") /
      (col("c1") + col("c2") - coalesce(col("inter"), lit(0L))).cast("double")
    cand
      .join(sig.toDF("d1", "mh1"), Seq("d1"))
      .join(sig.toDF("d2", "mh2"), Seq("d2"))
      .withColumn("n_match",
        size(filter(zip_with(col("mh1"), col("mh2"), (x, y) => x === y),
          b => b)).cast("bigint"))
      .join(cnt.toDF("d1", "c1"), Seq("d1"))
      .join(cnt.toDF("d2", "c2"), Seq("d2"))
      .join(inter, Seq("d1", "d2"), "left")
      .select(col("d1"), col("d2"), col("n_match"),
        estJ.as("est_j"),
        coalesce(col("inter"), lit(0L)).cast("bigint").as("n_inter"),
        (col("c1") + col("c2") - coalesce(col("inter"), lit(0L)))
          .cast("bigint").as("n_union"),
        exactJ.as("exact_j"),
        abs(estJ - exactJ).as("abs_err"))
  }

  /** Auditable CHAR MinHash (q212): the q153 calibration audit run
    * over the CODEPOINT-n-gram chain — per banded candidate pair on
    * the q211 space-free corpus, signature-estimated Jaccard vs the
    * EXACT char-4-gram-set Jaccard with the per-pair absolute error.
    * The char chain (r14) inherits q153's question with a new twist:
    * grams are 4 characters instead of 3 words, so gram sets are
    * larger and denser — this table says whether 32 permutations
    * still estimate well enough at the 0.7 operating point on
    * space-free text. Same candidate-bounded scale shape as q153.
    * TWO-STAGE ORACLE: DuckDB re-derives bands, candidates, and slot
    * matches from the dumped char signature matrix (aux_char_sig32)
    * and the exact Jaccard from the re-synthesized corpus (the shared
    * spaceFreeZhCorpusSql twin).
    */
  val q212 = QueryDef.sql(
    "q212_char_minhash_calibration",
    s"""WITH s AS (
       |  SELECT doc_id, list(h ORDER BY pos) AS mh
       |  FROM read_parquet('__GRAFT_OUT__/aux_char_sig32/*.parquet')
       |  GROUP BY doc_id),
       |b AS (
       |  SELECT doc_id, g.b AS band, list_slice(mh, g.b*4 + 1, g.b*4 + 4) AS key
       |  FROM s CROSS JOIN (SELECT unnest(range(8)) AS b) g),
       |cand AS (
       |  SELECT a.doc_id AS d1, c2.doc_id AS d2
       |  FROM b a JOIN b c2 ON a.band = c2.band AND a.key = c2.key
       |    AND a.doc_id < c2.doc_id
       |  GROUP BY d1, d2),
       |m AS (
       |  SELECT cand.d1, cand.d2,
       |    CAST(len(list_filter(range(1, 33), i -> s1.mh[i] = s2.mh[i])) AS BIGINT)
       |      AS n_match
       |  FROM cand JOIN s s1 ON s1.doc_id = cand.d1
       |            JOIN s s2 ON s2.doc_id = cand.d2),
       |${graft.ops.Dedup.spaceFreeZhCorpusSql},
       |${graft.ops.Dedup.charGramCteSql("c", "sh", 4)},
       |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c FROM sh GROUP BY doc_id),
       |iv AS (
       |  SELECT m2.d1, m2.d2, CAST(count(*) AS BIGINT) AS inter
       |  FROM m m2 JOIN sh a ON a.doc_id = m2.d1
       |            JOIN sh b2 ON b2.doc_id = m2.d2 AND b2.gram = a.gram
       |  GROUP BY m2.d1, m2.d2)
       |SELECT m.d1, m.d2, m.n_match,
       |  CAST(m.n_match AS DOUBLE) / 32.0 AS est_j,
       |  CAST(COALESCE(iv.inter, 0) AS BIGINT) AS n_inter,
       |  CAST(c1.c + c2.c - COALESCE(iv.inter, 0) AS BIGINT) AS n_union,
       |  CAST(COALESCE(iv.inter, 0) AS DOUBLE)
       |    / CAST(c1.c + c2.c - COALESCE(iv.inter, 0) AS DOUBLE) AS exact_j,
       |  abs(CAST(m.n_match AS DOUBLE) / 32.0
       |    - CAST(COALESCE(iv.inter, 0) AS DOUBLE)
       |      / CAST(c1.c + c2.c - COALESCE(iv.inter, 0) AS DOUBLE)) AS abs_err
       |FROM m JOIN cnt c1 ON c1.doc_id = m.d1
       |       JOIN cnt c2 ON c2.doc_id = m.d2
       |       LEFT JOIN iv ON iv.d1 = m.d1 AND iv.d2 = m.d2
       |ORDER BY m.d1, m.d2""".stripMargin) { (s, dir) =>
    NonOracle.charMinhashCalibration(graft.ops.Dedup.spaceFreeZhCorpus(s, dir))
      .orderBy(col("d1"), col("d2"))
  }

  /** The q212 kernel over any (doc_id, text) frame; unsorted output —
    * the shared [[calibrationAudit]] core fed by the fused codepoint
    * signature kernel and xxhash64'd distinct char grams.
    */
  def charMinhashCalibration(docs: org.apache.spark.sql.DataFrame,
                             n: Int = 4): org.apache.spark.sql.DataFrame =
    calibrationAudit(
      Dedup.charMinhashSignatures(docs, 32, n).localCheckpoint(false),
      docs.select(col("doc_id"),
          explode(array_distinct(Dedup.charShingles(col("text"), n))).as("sg"))
        .select(col("doc_id"), xxhash64(col("sg")).as("sh")))

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

  /** Perceptual-hash IMAGE near-dup pairs (q177): dHash-64 over the
    * decoded luma grid ([[Multimodal.PHash]] — real pixels when a JDK
    * decoder applies, the deterministic stub grid otherwise), then
    * EXACTLY the q46 machinery: [[Dedup.simhashBandPairs]] is the one
    * definition of the 4x16-bit banded candidate join and the
    * bit_count hamming verify for BOTH modalities — a text SimHash
    * and an image dHash are the same 64-bit object downstream. The
    * multimodal column's first real DEDUP use (q48 measures features,
    * q57 embeds; this strikes near-identical images that survive
    * re-encoding and rescaling, where exact byte dedup is blind).
    * Threshold 10 of 64 bits — the pigeonhole recall floor of the 4-
    * band scheme is exact through hamming 3 and decays gracefully
    * after (q46's trade); the planted-image recall spec pins a
    * re-encoded + rescaled + pixel-edited copy under it and a
    * different image far above it.
    *
    * TWO-STAGE ORACLE: pixel decoding has no SQL twin, so graft.Verify
    * dumps the (doc_id, sig) frame (`aux_phash64`) and DuckDB
    * re-derives bands, candidates, the distinct, and the hamming
    * verify — the q46 oracle shape at the image threshold.
    *
    * Scale: signature extraction is one batched narrow pass over the
    * media scan ([[Multimodal.phashSig64]]'s spread + mapPartitions);
    * banding is 4 rows per image into one shuffled equi-join — never
    * all-pairs.
    */
  val q177 = QueryDef.sql(
    "q177_phash_image_neardup",
    """WITH s AS (
      |  SELECT doc_id, sig
      |  FROM read_parquet('__GRAFT_OUT__/aux_phash64/*.parquet')),
      |b AS (
      |  SELECT doc_id, sig, g.b AS b, ((sig >> (g.b * 16)) & 65535) AS band
      |  FROM s CROSS JOIN (SELECT unnest(range(4)) AS b) g),
      |p AS (
      |  SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2,
      |    a.sig AS s1, c.sig AS s2
      |  FROM b a JOIN b c
      |    ON a.b = c.b AND a.band = c.band AND a.doc_id < c.doc_id)
      |SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS INTEGER) AS hamming
      |FROM p WHERE bit_count(xor(s1, s2)) <= 10
      |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
    Dedup.simhashBandPairs(
      Multimodal.phashSig64(s,
        Multimodal.attachSyntheticImages(s, Tables.documents(s, dir))),
      maxHamming = 10)
      .orderBy(col("d1"), col("d2"))
  }

  /** Sign-LSH approximate nearest neighbors (bucketed cosine top-3).
    * TWO-STAGE ORACLE: Verify dumps every embedding's 6-plane sign
    * bucket (aux_sign_bucket6, the codegen SignBucketExpr output);
    * DuckDB re-derives the hamming<=1 probe fan-out (masks 0 + the 6
    * single-bit flips), the bucket equi-join, candidate dedup, the
    * exact cosine rescoring (bit-identical q31 fold), and the top-3
    * window — everything past the plane projection itself.
    */
  val q47 = QueryDef.sql(
    "q47_knn_lsh",
    s"""WITH bkt AS (
       |  SELECT vec_id, bucket
       |  FROM read_parquet('__GRAFT_OUT__/aux_sign_bucket6/*.parquet')),
       |e AS (SELECT vec_id, embedding FROM embeddings),
       |q AS (
       |  SELECT b.vec_id AS qid, xor(b.bucket, m.mask) AS bucket
       |  FROM bkt b CROSS JOIN (SELECT unnest([0,1,2,4,8,16,32]) AS mask) m
       |  WHERE b.vec_id < 10),
       |cand AS (
       |  SELECT DISTINCT q.qid, c.vec_id AS cid
       |  FROM q JOIN bkt c USING (bucket) WHERE q.qid <> c.vec_id),
       |s AS (
       |  SELECT qid, cid,
       |    ${cosSqlZ("qe.embedding", "ce.embedding")} AS score
       |  FROM cand JOIN e qe ON cand.qid = qe.vec_id
       |            JOIN e ce ON cand.cid = ce.vec_id)
       |SELECT qid, cid, score, rnk FROM (
       |  SELECT qid, cid, score,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rnk
       |  FROM s)
       |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    Similarity.lshKnn(s, emb, emb.filter(col("vec_id") < 10), k = 3, nPlanes = 6)
      .orderBy(col("qid"), col("rnk"))
  }


  /** Production embedding dedup: LSH-bucketed cosine, keep-lowest-id.
    * TWO-STAGE ORACLE: given the 8-plane buckets (aux_sign_bucket8),
    * DuckDB re-derives the single-probe bucket self-join, the exact
    * cosine threshold, the keep-lowest-id duplicate set, and the
    * surviving ids.
    */
  val q51 = QueryDef.sql(
    "q51_embedding_dedup_prod",
    s"""WITH bkt AS (
       |  SELECT vec_id, bucket
       |  FROM read_parquet('__GRAFT_OUT__/aux_sign_bucket8/*.parquet')),
       |e AS (SELECT vec_id, embedding FROM embeddings),
       |p AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS cid
       |  FROM bkt a JOIN bkt b USING (bucket) WHERE a.vec_id < b.vec_id),
       |s AS (
       |  SELECT qid, cid,
       |    ${cosSqlZ("qe.embedding", "ce.embedding")} AS score
       |  FROM p JOIN e qe ON p.qid = qe.vec_id
       |         JOIN e ce ON p.cid = ce.vec_id),
       |dup AS (SELECT DISTINCT cid FROM s WHERE score >= 0.35)
       |SELECT vec_id FROM e
       |WHERE vec_id NOT IN (SELECT cid FROM dup)
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
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

  /** IVF ANN: k-means coarse quantizer + probe-limited exact search.
    * TWO-STAGE ORACLE: at lloydIters=1 the coarse centers are exactly
    * embeddings vec_id < 8 (deterministic first-k init, zero update
    * steps), so DuckDB re-derives the cell ASSIGNMENT from the raw
    * tables (the q43 argmin pattern). Only the probe targets — the
    * true cell centroids, a distributed per-slot MEAN whose float
    * summation order DuckDB cannot replay — come from Spark
    * (aux_ivf_centroids); probing, the in-cell search, and the top-3
    * ranking are all re-derived.
    */
  val q53 = QueryDef.sql(
    "q53_knn_ivf",
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |ctr AS (
       |  SELECT CAST(vec_id AS INT) AS center_id, embedding AS cv
       |  FROM embeddings WHERE vec_id < 8),
       |ad AS (
       |  SELECT e.vec_id, ctr.center_id,
       |    list_sum(list_transform(range(1, len(e.embedding) + 1),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(ctr.cv[i] AS DOUBLE))) AS dot,
       |    list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
       |    list_sum(list_transform(ctr.cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nb
       |  FROM e CROSS JOIN ctr),
       |asg AS (
       |  SELECT vec_id, center_id FROM (
       |    SELECT vec_id, center_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY
       |        CASE WHEN COALESCE(na, 0) = 0 OR COALESCE(nb, 0) = 0 THEN 1.0
       |             ELSE 1.0 - dot / (sqrt(na) * sqrt(nb)) END, center_id) AS rn
       |    FROM ad) WHERE rn = 1),
       |cen AS (
       |  SELECT center_id, list(x ORDER BY pos) AS cvec
       |  FROM read_parquet('__GRAFT_OUT__/aux_ivf_centroids/*.parquet')
       |  GROUP BY center_id),
       |pq AS (
       |  SELECT q.vec_id AS qid, cen.center_id,
       |    list_sum(list_transform(range(1, len(q.embedding) + 1),
       |      i -> CAST(q.embedding[i] AS DOUBLE) * cen.cvec[i])) AS dot,
       |    list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
       |    list_sum(list_transform(cen.cvec, x -> x * x)) AS nb
       |  FROM e q CROSS JOIN cen WHERE q.vec_id < 10),
       |pr AS (
       |  SELECT qid, center_id FROM (
       |    SELECT qid, center_id,
       |      row_number() OVER (PARTITION BY qid ORDER BY
       |        CASE WHEN COALESCE(na, 0) = 0 OR COALESCE(nb, 0) = 0 THEN 1.0
       |             ELSE 1.0 - dot / (sqrt(na) * sqrt(nb)) END, center_id) AS rn
       |    FROM pq) WHERE rn <= 3),
       |cand AS (
       |  SELECT pr.qid, asg.vec_id AS cid
       |  FROM pr JOIN asg USING (center_id) WHERE pr.qid <> asg.vec_id),
       |s AS (
       |  SELECT cand.qid, cand.cid,
       |    ${cosSqlZ("qe.embedding", "ce.embedding")} AS score
       |  FROM cand JOIN e qe ON cand.qid = qe.vec_id
       |            JOIN e ce ON cand.cid = ce.vec_id)
       |SELECT qid, cid, score, rnk FROM (
       |  SELECT qid, cid, score,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rnk
       |  FROM s)
       |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    Similarity.ivfKnn(s, emb, emb.filter(col("vec_id") < 10), k = 3,
      nCells = 8, nProbe = 3, lloydIters = 1)
      .orderBy(col("qid"), col("rnk"))
  }


  /** IVF-PQ ANN: coarse cells + product-quantized ADC shortlist +
    * exact re-rank (graft.ops.Pq). Accuracy proven by PqSpec's
    * recall-vs-brute-force gate. TWO-STAGE ORACLE: training is fully
    * deterministic (hash-ordered sample, driver-side Lloyd, first-k
    * coarse init at lloydIters=1), so Verify dumps the trained
    * quantizer state — coarse centers + per-subspace codebooks, the
    * saveIndex meta row (aux_pq_meta) — and DuckDB re-derives the
    * ENTIRE serving path over it: unit normalization (x * (1/sqrt(s)),
    * the kernel's literal fold), coarse assignment argmin, per-subspace
    * L2 encode argmin, the query LUT, the ADC shortlist (ordered-list
    * sum = the j-ascending fold of pq_adc_dot), and the exact top-3
    * re-rank over raw vectors.
    */
  val q102 = QueryDef.sql(
    "q102_knn_ivfpq",
    s"""WITH meta AS (
       |  SELECT part, i, j, pos, x
       |  FROM read_parquet('__GRAFT_OUT__/aux_pq_meta/*.parquet')),
       |e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |nv AS (
       |  SELECT vec_id, v,
       |    CASE WHEN s2 > 0 THEN list_transform(v, x -> x * (1.0 / sqrt(s2)))
       |         ELSE v END AS vn
       |  FROM (SELECT vec_id, v,
       |          list_sum(list_transform(v, x -> x * x)) AS s2 FROM e)),
       |ctr AS (
       |  SELECT i AS center_id, list(x ORDER BY pos) AS cv
       |  FROM meta WHERE part = 'c' GROUP BY i),
       |cb AS (
       |  SELECT meta.i AS j, meta.j AS c, list(x ORDER BY pos) AS w
       |  FROM meta WHERE part = 'k' GROUP BY meta.i, meta.j),
       |ad AS (
       |  SELECT nv.vec_id, ctr.center_id,
       |    list_sum(list_transform(range(1, len(nv.vn) + 1),
       |      i -> nv.vn[i] * ctr.cv[i])) AS dot,
       |    list_sum(list_transform(nv.vn, x -> x * x)) AS na,
       |    list_sum(list_transform(ctr.cv, x -> x * x)) AS nb
       |  FROM nv CROSS JOIN ctr),
       |asg AS (
       |  SELECT vec_id, center_id FROM (
       |    SELECT vec_id, center_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY
       |        CASE WHEN COALESCE(na, 0) = 0 OR COALESCE(nb, 0) = 0 THEN 1.0
       |             ELSE 1.0 - dot / (sqrt(na) * sqrt(nb)) END, center_id) AS rn
       |    FROM ad) WHERE rn = 1),
       |enc AS (
       |  SELECT nv.vec_id, cb.j, cb.c,
       |    list_sum(list_transform(range(1, len(cb.w) + 1),
       |      i -> (coalesce(nv.vn[cb.j * len(cb.w) + i], 0.0) - cb.w[i])
       |         * (coalesce(nv.vn[cb.j * len(cb.w) + i], 0.0) - cb.w[i]))) AS d
       |  FROM nv CROSS JOIN cb),
       |codes AS (
       |  SELECT vec_id, j, c FROM (
       |    SELECT vec_id, j, c,
       |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
       |    FROM enc) WHERE rn = 1),
       |lut AS (
       |  SELECT q.vec_id AS qid, cb.j, cb.c,
       |    list_sum(list_transform(range(1, len(cb.w) + 1),
       |      i -> coalesce(q.vn[cb.j * len(cb.w) + i], 0.0) * cb.w[i])) AS l
       |  FROM (SELECT * FROM nv WHERE vec_id < 10) q CROSS JOIN cb),
       |pq AS (
       |  SELECT q.vec_id AS qid, ctr.center_id,
       |    list_sum(list_transform(range(1, len(q.vn) + 1),
       |      i -> q.vn[i] * ctr.cv[i])) AS dot,
       |    list_sum(list_transform(q.vn, x -> x * x)) AS na,
       |    list_sum(list_transform(ctr.cv, x -> x * x)) AS nb
       |  FROM (SELECT * FROM nv WHERE vec_id < 10) q CROSS JOIN ctr),
       |pr AS (
       |  SELECT qid, center_id FROM (
       |    SELECT qid, center_id,
       |      row_number() OVER (PARTITION BY qid ORDER BY
       |        CASE WHEN COALESCE(na, 0) = 0 OR COALESCE(nb, 0) = 0 THEN 1.0
       |             ELSE 1.0 - dot / (sqrt(na) * sqrt(nb)) END, center_id) AS rn
       |    FROM pq) WHERE rn <= 3),
       |cand AS (
       |  SELECT pr.qid, asg.vec_id AS cid
       |  FROM pr JOIN asg USING (center_id) WHERE pr.qid <> asg.vec_id),
       |adc AS (
       |  SELECT qid, cid, list_sum(list(l ORDER BY j)) AS adc
       |  FROM (
       |    SELECT cand.qid, cand.cid, codes.j, lut.l
       |    FROM cand
       |    JOIN codes ON codes.vec_id = cand.cid
       |    JOIN lut ON lut.qid = cand.qid AND lut.j = codes.j AND lut.c = codes.c)
       |  GROUP BY qid, cid),
       |short AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      row_number() OVER (PARTITION BY qid ORDER BY adc DESC, cid) AS arnk
       |    FROM adc) WHERE arnk <= 24),
       |s AS (
       |  SELECT short.qid, short.cid,
       |    ${cosSqlZ("qe.v", "ce.v")} AS score
       |  FROM short JOIN e qe ON short.qid = qe.vec_id
       |             JOIN e ce ON short.cid = ce.vec_id)
       |SELECT qid, cid, score, rnk FROM (
       |  SELECT qid, cid, score,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rnk
       |  FROM s)
       |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    Pq.ivfPqKnn(s, emb, emb.filter(col("vec_id") < 10), k = 3,
      nCells = 8, nProbe = 3, rerank = 24, lloydIters = 1)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Incremental distinct-token stats via mergeable AUDITABLE HLL
    * state (graft.ops.Sketches): history registers built once
    * (doc_id < 300), the delta batch's registers built separately,
    * states merged register-wise (union + max — plain integer
    * arithmetic) — emitted beside the full-rebuild estimate, which it
    * must equal row for row. TWO-STAGE ORACLE (the q128 pattern):
    * Verify dumps the per-part 63-bit hashes (aux_hll_hashes_split);
    * DuckDB re-derives per-part registers, REPLAYS the max-merge, and
    * independently rebuilds from the union — so the merge==rebuild
    * identity is checked cross-engine, not just spec-asserted. The
    * binary datasketches state path (distinctSketch/mergeSketchStates/
    * hll_union) remains the engine-internal production twin, gated by
    * SketchMergeSpec's merge==rebuild assertion.
    */
  val q106 = QueryDef.sql(
    "q106_sketch_merge",
    """WITH h AS (
      |  SELECT part, source, hbits
      |  FROM read_parquet('__GRAFT_OUT__/aux_hll_hashes_split/*.parquet')),
      |r0 AS (
      |  SELECT part, source, CAST(hbits & 511 AS INT) AS idx, hbits >> 9 AS rest
      |  FROM h),
      |rpart AS (
      |  SELECT part, source, idx,
      |    max(CASE WHEN rest = 0 THEN 55
      |             ELSE 55 - length(bin(rest)) END) AS rho
      |  FROM r0 GROUP BY part, source, idx),
      |rinc AS (
      |  SELECT source, idx, max(rho) AS rho FROM rpart GROUP BY source, idx),
      |rreb AS (
      |  SELECT source, idx,
      |    max(CASE WHEN rest = 0 THEN 55
      |             ELSE 55 - length(bin(rest)) END) AS rho
      |  FROM r0 GROUP BY source, idx),
      |regs AS (
      |  SELECT 'inc' AS path, source, idx, rho FROM rinc
      |  UNION ALL SELECT 'reb', source, idx, rho FROM rreb),
      |grid AS (
      |  SELECT p.path, s.source, g.i
      |  FROM (SELECT DISTINCT source FROM h) s
      |  CROSS JOIN (SELECT unnest(['inc', 'reb']) AS path) p
      |  CROSS JOIN (SELECT unnest(range(0, 512)) AS i) g),
      |fullr AS (
      |  SELECT grid.path, grid.source, grid.i, COALESCE(r.rho, 0) AS rho
      |  FROM grid LEFT JOIN regs r
      |    ON r.path = grid.path AND r.source = grid.source AND r.idx = grid.i),
      |sums AS (
      |  SELECT path, source,
      |    list_sum(list(1.0 / CAST(CAST(1 AS BIGINT) << rho AS DOUBLE)
      |      ORDER BY i)) AS z,
      |    CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
      |  FROM fullr GROUP BY path, source),
      |est AS (
      |  SELECT path, source, v,
      |    (0.7213 / (1.0 + 1.079 / 512.0) * 262144.0) / z AS raw
      |  FROM sums),
      |e2 AS (
      |  SELECT path, source,
      |    CASE WHEN raw <= 1280.0 AND v > 0
      |      THEN 512.0 * round(ln(512.0 / CAST(v AS DOUBLE)), 9)
      |      ELSE raw END AS hll_est
      |  FROM est)
      |SELECT i.source, i.hll_est AS est_incremental, r.hll_est AS est_rebuild
      |FROM e2 i JOIN e2 r ON i.source = r.source
      |WHERE i.path = 'inc' AND r.path = 'reb'
      |ORDER BY i.source""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val histReg = Sketches.hllRegisters(
      Sketches.hllHashes(docs.filter(col("doc_id") < 300)))
    val deltaReg = Sketches.hllRegisters(
      Sketches.hllHashes(docs.filter(col("doc_id") >= 300)))
    val inc = Sketches.hllEstimates(
      Sketches.mergeRegisterStates(histReg, deltaReg))
      .withColumnRenamed("hll_est", "est_incremental")
    val reb = Sketches.hllEstimates(Sketches.hllRegisters(Sketches.hllHashes(docs)))
      .withColumnRenamed("hll_est", "est_rebuild")
    inc.join(reb, "source").orderBy(col("source"))
  }

  /** The full BPE training loop, UNROLLED into `nMerges` chained CTE
    * iterations — DuckDB re-runs the ENTIRE algorithm from the raw
    * documents table (no aux artifact): tokenize (the q21 twin),
    * code-point + '</w>' init, then per iteration the weighted
    * adjacent-pair count, the (cnt desc, a, b) argmax with the
    * minCount >= 2 stop (an empty b_i leaves seg unchanged, so early
    * stop propagates), and the left-to-right non-overlapping merge.
    * The merge is a list_reduce fold over singleton-wrapped symbols:
    * fold == the scan kernel because a just-merged element a||b can
    * never equal the pattern's left symbol a (b is non-empty), so
    * overlapping re-merges are impossible — the same argument as the
    * kernel's index skip. Integer counts only, binary string
    * collation both sides: no float-order risk anywhere. Every
    * iteration CTE is AS MATERIALIZED: seg_i references seg_{i-1}
    * twice, so DuckDB's default inlining would blow the chain up
    * exponentially (2^20 base scans); materialization makes it one
    * pass per iteration.
    */
  private[ops] def bpeChainSql(nMerges: Int): String = {
    // seg CTEs carry `word` (unused by q105's merge output, keyed on
    // by q160's fertility rollup: segN(word) IS the word's final
    // segmentation under the learned merges)
    val head =
      """WITH w AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(list_filter(string_split_regex(text, '[ \t\n\x0B\f\r]+'), x -> x <> '')) AS word
        |    FROM documents WHERE doc_id < 500) GROUP BY word),
        |seg0 AS MATERIALIZED (
        |  SELECT word, freq, list_append(regexp_extract_all(word, '(?s).'), '</w>') AS s
        |  FROM w WHERE word <> '')""".stripMargin
    val iters = (1 to nMerges).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, s[k] AS a, s[k+1] AS b
         |    FROM (SELECT freq, s, unnest(range(1, len(s))) AS k
         |          FROM seg${i - 1} WHERE len(s) >= 2))
         |  GROUP BY a, b),
         |b$i AS MATERIALIZED (SELECT a, b FROM p$i WHERE cnt >= 2 ORDER BY cnt DESC, a, b LIMIT 1),
         |seg$i AS MATERIALIZED (
         |  SELECT word, freq,
         |    CASE WHEN mb.a IS NULL THEN s
         |         ELSE list_reduce(list_transform(s, x -> [x]),
         |           (acc, x) -> CASE WHEN acc[-1] = mb.a AND x[1] = mb.b
         |                       THEN list_append(acc[1:len(acc)-1], mb.a || mb.b)
         |                       ELSE list_append(acc, x[1]) END)
         |    END AS s
         |  FROM seg${i - 1} LEFT JOIN b$i mb ON TRUE)""".stripMargin
    }
    (head +: iters).mkString(",\n")
  }

  private def bpeSql(nMerges: Int): String = {
    val unions = (1 to nMerges)
      .map(i => s"""SELECT CAST(${i - 1} AS BIGINT) AS rank, a AS "left", b AS "right" FROM b$i""")
      .mkString("\nUNION ALL ")
    bpeChainSql(nMerges) +
      s""",\nm AS (\n$unions)\nSELECT rank, "left", "right" FROM m ORDER BY rank"""
  }

  /** Distributed BPE tokenizer training (graft.ops.Bpe): 20 merges
    * learned over the word-type table of the first 500 docs, emitted
    * as the ranked merge list. FULL-REPLAY ORACLE: [[bpeSql]] unrolls
    * all 20 training iterations into chained CTEs, so DuckDB learns
    * the merges independently from the raw table — the one iterative
    * trainer in the engine whose whole loop the oracle re-runs.
    * Semantics additionally gated by BpeSpec (the Sennrich worked
    * example reproduces exactly; driver == distributed == batched).
    */
  val q105 = QueryDef.sql("q105_bpe_train", bpeSql(20)) { (s, dir) =>
    val words = Bpe.wordFreqs(Tables.documents(s, dir).filter(col("doc_id") < 500))
    val merges = Bpe.train(words, nMerges = 20)
    import s.implicits._
    merges.zipWithIndex
      .map { case ((a, b), r) => (r.toLong, a, b) }
      .toDF("rank", "left", "right")
  }

  /** Tokenizer fertility per source (q160): the data-card numbers that
    * link q38's token counts to q140's per-source rollup — under the
    * q105 BPE vocabulary, how many subword units does each source's
    * text cost? Emits per source: whitespace-word and BPE-unit totals,
    * char/byte volume (whitespace excluded — the units are per-word),
    * fertility = units/word, chars/token and bytes/token. A source
    * whose bytes/token runs high (script or jargon the vocabulary
    * never learned) burns context length; the number feeds the q157
    * padding audit and q161's budget math.
    *
    * Scale: ONE corpus aggregate (the (source, word) rollup,
    * checkpointed so training and the rollup share it); segmentation
    * runs on DISTINCT (source, word) rows via the codegen
    * BpeSegmentExpr — word-type-sized work, not corpus-sized. FULL-
    * REPLAY ORACLE: DuckDB re-learns the 20 merges from raw documents
    * (the q105 chain, which also yields each word's final
    * segmentation: training's merge application IS greedy inference
    * for in-vocabulary words) and re-derives every count and ratio —
    * integer sums + literal-identical divisions.
    */
  val q160 = QueryDef.sql(
    "q160_tokenizer_fertility",
    bpeChainSql(20) +
      s""",
         |sw AS (
         |  SELECT source, word, CAST(count(*) AS BIGINT) AS freq FROM (
         |    SELECT source, unnest(list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')) AS word
         |    FROM documents WHERE doc_id < 500) GROUP BY source, word),
         |u AS (SELECT word, CAST(len(s) AS BIGINT) AS units FROM seg20),
         |r AS (
         |  SELECT sw.source,
         |    CAST(sum(sw.freq) AS BIGINT) AS n_words,
         |    CAST(sum(sw.freq * u.units) AS BIGINT) AS n_tokens,
         |    CAST(sum(sw.freq * length(sw.word)) AS BIGINT) AS n_chars,
         |    CAST(sum(sw.freq * strlen(sw.word)) AS BIGINT) AS n_bytes
         |  FROM sw JOIN u USING (word) GROUP BY sw.source)
         |SELECT source, n_words, n_tokens, n_chars, n_bytes,
         |  CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE) AS fertility,
         |  CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS chars_per_token,
         |  CAST(n_bytes AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS bytes_per_token
         |FROM r ORDER BY source""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 500)
    // the one corpus pass; checkpointed because it feeds BOTH the
    // trainer's word-type table and the fertility rollup
    val sw = docs
      .select(col("source"),
        explode(TextAnalytics.toks(col("text"))).as("word"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).cast("bigint").as("freq"))
      .localCheckpoint(true)
    val words = sw.groupBy(col("word"))
      .agg(sum(col("freq")).cast("bigint").as("freq"))
    val merges = Bpe.train(words, nMerges = 20)
    val u = sw.withColumn("units",
      size(graft.functions.functions.bpe_segment(col("word"), merges))
        .cast("bigint"))
    u.groupBy(col("source"))
      .agg(
        sum(col("freq")).cast("bigint").as("n_words"),
        sum(col("freq") * col("units")).cast("bigint").as("n_tokens"),
        sum(col("freq") * length(col("word")).cast("bigint"))
          .cast("bigint").as("n_chars"),
        sum(col("freq") * octet_length(col("word")).cast("bigint"))
          .cast("bigint").as("n_bytes"))
      .select(col("source"), col("n_words"), col("n_tokens"), col("n_chars"),
        col("n_bytes"),
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_tokens").cast("double"))
          .as("chars_per_token"),
        (col("n_bytes").cast("double") / col("n_tokens").cast("double"))
          .as("bytes_per_token"))
      .orderBy(col("source"))
  }

  /** BPE vocabulary-coverage audit (q170): the complement of q160's
    * fertility — not "how many units does a word cost" but "does the
    * learned vocabulary compress it AT ALL". Per source (frequency-
    * weighted over the q160 word rollup): the fraction of emitted
    * units that are LEARNED MERGES (multi-symbol units — anything
    * other than a single code point or the bare '</w>' marker; a
    * char+'</w>' merge IS learned and counts), and the rate of
    * FRAGMENTED words — words the 20-merge vocabulary segments into
    * nothing but atomic symbols, the BPE analogue of OOV. A source
    * whose frag rate runs high (script/jargon the vocabulary never
    * learned) is exactly where q160's bytes-per-token blows up; this
    * query names the words responsible rather than the aggregate
    * symptom. Pure integer counts + literal divisions.
    *
    * Scale: identical shape to q160 — ONE corpus (source, word)
    * rollup (checkpointed, shared by trainer and audit), segmentation
    * on word-TYPE rows via the codegen BpeSegmentExpr, then an S-row
    * aggregate. FULL-REPLAY ORACLE: DuckDB re-learns the merges and
    * re-segments from raw documents (the q105/q160 chain: training's
    * merge application == greedy inference for in-vocabulary words,
    * and the doc_id < 500 slice IS the training set).
    */
  val q170 = QueryDef.sql(
    "q170_vocab_coverage",
    bpeChainSql(20) +
      s""",
         |sw AS (
         |  SELECT source, word, CAST(count(*) AS BIGINT) AS freq FROM (
         |    SELECT source, unnest(list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')) AS word
         |    FROM documents WHERE doc_id < 500) GROUP BY source, word),
         |u AS (
         |  SELECT word,
         |    CAST(len(s) AS BIGINT) AS units,
         |    CAST(len(list_filter(s,
         |      x -> NOT (length(x) = 1 OR x = '</w>'))) AS BIGINT) AS merged
         |  FROM seg20),
         |r AS (
         |  SELECT sw.source,
         |    CAST(sum(sw.freq) AS BIGINT) AS n_words,
         |    CAST(sum(sw.freq * u.units) AS BIGINT) AS n_units,
         |    CAST(sum(sw.freq * u.merged) AS BIGINT) AS n_merged_units,
         |    CAST(sum(CASE WHEN u.merged = 0 THEN sw.freq ELSE 0 END) AS BIGINT)
         |      AS n_frag_words
         |  FROM sw JOIN u USING (word) GROUP BY sw.source)
         |SELECT source, n_words, n_units, n_merged_units, n_frag_words,
         |  CAST(n_merged_units AS DOUBLE) / CAST(n_units AS DOUBLE)
         |    AS merged_unit_frac,
         |  CAST(n_frag_words AS DOUBLE) / CAST(n_words AS DOUBLE)
         |    AS frag_word_rate
         |FROM r ORDER BY source""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 500)
    val sw = docs
      .select(col("source"),
        explode(TextAnalytics.toks(col("text"))).as("word"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).cast("bigint").as("freq"))
      .localCheckpoint(true)
    val words = sw.groupBy(col("word"))
      .agg(sum(col("freq")).cast("bigint").as("freq"))
    val merges = Bpe.train(words, nMerges = 20)
    val seg = graft.functions.functions.bpe_segment(col("word"), merges)
    val u = sw
      .withColumn("units", size(seg).cast("bigint"))
      .withColumn("merged",
        size(filter(seg, x => !(length(x) === 1 || x === "</w>")))
          .cast("bigint"))
    u.groupBy(col("source"))
      .agg(
        sum(col("freq")).cast("bigint").as("n_words"),
        sum(col("freq") * col("units")).cast("bigint").as("n_units"),
        sum(col("freq") * col("merged")).cast("bigint").as("n_merged_units"),
        sum(when(col("merged") === 0, col("freq")).otherwise(0L))
          .cast("bigint").as("n_frag_words"))
      .select(col("source"), col("n_words"), col("n_units"),
        col("n_merged_units"), col("n_frag_words"),
        (col("n_merged_units").cast("double") / col("n_units").cast("double"))
          .as("merged_unit_frac"),
        (col("n_frag_words").cast("double") / col("n_words").cast("double"))
          .as("frag_word_rate"))
      .orderBy(col("source"))
  }

  /** Cross-source syndication matrix (q173): for every source pair
    * (unordered; the diagonal is within-source), the count of VERIFIED
    * near-dup pairs spanning them and the distinct documents involved
    * — "which sources copy from which". The q162 dedup-impact report
    * says how much each source shrinks under dedup; this says WHERE
    * the duplication flows: a hot off-diagonal cell is syndication
    * (mirrors, wire copy, scraped re-posts) that silently multiplies a
    * document's effective epochs across the q110 mixture's buckets,
    * and a hot diagonal is within-source templating. Verification is
    * the q132 criterion — MinHash slot agreement >= 0.7, never raw
    * band collisions.
    *
    * Scale: the q45 shape — banded equi-join, never all-pairs; the
    * signature frame is checkpointed once (three consumers); source
    * attachment is two id-keyed joins shipping (doc_id, source); the
    * matrix is at most S² rows. TWO-STAGE ORACLE: DuckDB re-derives
    * bands, candidates, slot agreement, the source pairing, and both
    * aggregates from the dumped signature matrix + raw documents.
    */
  def syndicationMatrix(docs: org.apache.spark.sql.DataFrame,
                        nHashes: Int = 32, minAgree: Double = 0.7)
      : org.apache.spark.sql.DataFrame = {
    val sigs = Dedup.minhashSignatures(docs, nHashes).localCheckpoint(false)
    // the SAME verification criterion the curation pipeline strikes on
    // (Dedup.verifiedPairs): this report must count exactly the pairs
    // the pipeline would remove
    val pairs = Dedup.verifiedPairs(sigs, nHashes, minAgree = minAgree)
    val src = docs.select(col("doc_id"), col("source"))
    val ps = pairs
      .join(src.toDF("d1s", "src1"), col("d1s") === col("d1"))
      .join(src.toDF("d2s", "src2"), col("d2s") === col("d2"))
      .select(least(col("src1"), col("src2")).as("s1"),
        greatest(col("src1"), col("src2")).as("s2"),
        col("d1"), col("d2"))
    val cells = ps.groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"))
    val docsIn = ps
      .select(col("s1"), col("s2"),
        explode(array(col("d1"), col("d2"))).as("d"))
      .groupBy(col("s1"), col("s2"))
      .agg(countDistinct(col("d")).cast("bigint").as("n_docs"))
    cells.join(docsIn, Seq("s1", "s2"))
  }

  val q173 = QueryDef.sql(
    "q173_syndication_matrix",
    """WITH s AS (
      |  SELECT doc_id, list(h ORDER BY pos) AS mh
      |  FROM read_parquet('__GRAFT_OUT__/aux_minhash_sig32/*.parquet')
      |  GROUP BY doc_id),
      |b AS (
      |  SELECT doc_id, g.b AS band, list_slice(mh, g.b*4 + 1, g.b*4 + 4) AS key
      |  FROM s CROSS JOIN (SELECT unnest(range(8)) AS b) g),
      |cand AS (
      |  SELECT a.doc_id AS d1, c.doc_id AS d2
      |  FROM b a JOIN b c ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
      |  GROUP BY d1, d2),
      |m AS (
      |  SELECT cand.d1, cand.d2,
      |    CAST(len(list_filter(range(1, 33), i -> s1.mh[i] = s2.mh[i])) AS BIGINT)
      |      AS n_match
      |  FROM cand JOIN s s1 ON s1.doc_id = cand.d1
      |            JOIN s s2 ON s2.doc_id = cand.d2),
      |p AS (SELECT d1, d2 FROM m WHERE CAST(n_match AS DOUBLE) / 32.0 >= 0.7),
      |ps AS (
      |  SELECT least(da.source, dc.source) AS s1,
      |    greatest(da.source, dc.source) AS s2, p.d1, p.d2
      |  FROM p JOIN documents da ON da.doc_id = p.d1
      |         JOIN documents dc ON dc.doc_id = p.d2),
      |cells AS (
      |  SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_pairs
      |  FROM ps GROUP BY s1, s2),
      |di AS (
      |  SELECT s1, s2, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
      |  FROM (SELECT s1, s2, unnest([d1, d2]) AS d FROM ps)
      |  GROUP BY s1, s2)
      |SELECT cells.s1, cells.s2, cells.n_pairs, di.n_docs
      |FROM cells JOIN di USING (s1, s2)
      |ORDER BY s1, s2""".stripMargin) { (s, dir) =>
    syndicationMatrix(Tables.documents(s, dir).filter(col("doc_id") < 500))
      .orderBy(col("s1"), col("s2"))
  }

  /** Full multimodal pipeline: attach media -> (stub) embed -> exact
    * duplicate detection via embedding kNN. Identical payloads produce
    * identical embeddings, so exact dups surface at similarity 1.
    * TWO-STAGE ORACLE: the stub embeddings are a deterministic pure
    * function of the payload bytes, so Verify dumps the embedding
    * frame (aux_mm_embed) and DuckDB runs the ENTIRE brute-force kNN —
    * cross join, bit-identical cosine, top-3 window — over it.
    */
  val q57 = QueryDef.sql(
    "q57_multimodal_embed_knn",
    s"""WITH e AS (
       |  SELECT vec_id, list(x ORDER BY pos) AS v
       |  FROM read_parquet('__GRAFT_OUT__/aux_mm_embed/*.parquet')
       |  GROUP BY vec_id),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
       |s AS (
       |  SELECT qid, e.vec_id AS cid,
       |    ${cosSqlZ("qv", "v")} AS score
       |  FROM q CROSS JOIN e WHERE qid <> e.vec_id)
       |SELECT qid, cid, score, rnk FROM (
       |  SELECT qid, cid, score,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rnk
       |  FROM s)
       |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin) { (s, dir) =>
    val emb = Multimodal.embedStub(s,
      Multimodal.attachMedia(Tables.documents(s, dir)))
      .toDF("vec_id", "v")
    Similarity.bruteForceKnn(
      emb.filter(col("vec_id") < 10).toDF("qid", "qv"), emb, k = 3)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Auditable HLL (q128): per-source distinct-term estimate whose
    * ENTIRE estimation path — register derivation (bit mask / shift /
    * bit-length), the 2^-M fold in register-index order, the bias
    * constant, and the linear-counting branch — is re-derived by
    * DuckDB from the dumped 63-bit hashes (aux_hll_hashes), next to
    * the exact COUNT(DISTINCT) it approximates. Unlike q52's
    * engine-internal sketches, every arithmetic step here is
    * cross-engine replayable: 2^-rho terms are exact powers of two
    * (integer shift + one division, no libm pow), the fold order is
    * pinned, and ln appears only in the small-range branch under the
    * rounded-ln discipline. SketchAccuracySpec gates the estimate
    * against the 512-register error bound.
    */
  val q128 = QueryDef.sql(
    "q128_hll_audit",
    s"""WITH h AS (
       |  SELECT source, hbits
       |  FROM read_parquet('__GRAFT_OUT__/aux_hll_hashes/*.parquet')),
       |r0 AS (
       |  SELECT source, CAST(hbits & 511 AS INT) AS idx, hbits >> 9 AS rest
       |  FROM h),
       |r AS (
       |  SELECT source, idx,
       |    max(CASE WHEN rest = 0 THEN 55
       |             ELSE 55 - length(bin(rest)) END) AS rho
       |  FROM r0 GROUP BY source, idx),
       |grid AS (
       |  SELECT s.source, g.i
       |  FROM (SELECT DISTINCT source FROM h) s
       |  CROSS JOIN (SELECT unnest(range(0, 512)) AS i) g),
       |fullr AS (
       |  SELECT grid.source, grid.i, COALESCE(r.rho, 0) AS rho
       |  FROM grid LEFT JOIN r ON r.source = grid.source AND r.idx = grid.i),
       |sums AS (
       |  SELECT source,
       |    list_sum(list(1.0 / CAST(CAST(1 AS BIGINT) << rho AS DOUBLE)
       |      ORDER BY i)) AS z,
       |    CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
       |  FROM fullr GROUP BY source),
       |est AS (
       |  SELECT source, v,
       |    (0.7213 / (1.0 + 1.079 / 512.0) * 262144.0) / z AS raw
       |  FROM sums),
       |e2 AS (
       |  SELECT source,
       |    CASE WHEN raw <= 1280.0 AND v > 0
       |      THEN 512.0 * round(ln(512.0 / CAST(v AS DOUBLE)), 9)
       |      ELSE raw END AS hll_est
       |  FROM est),
       |ex AS (
       |  SELECT source, CAST(count(DISTINCT term) AS BIGINT) AS n_exact
       |  FROM (SELECT source, unnest(list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')) AS term
       |        FROM documents)
       |  GROUP BY source)
       |SELECT ex.source, ex.n_exact, e2.hll_est
       |FROM ex JOIN e2 USING (source)
       |ORDER BY ex.source""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val est = Sketches.hllEstimates(
      Sketches.hllRegisters(Sketches.hllHashes(docs)))
    val exact = docs
      .select(col("source"), explode(TextAnalytics.toks(col("text"))).as("term"))
      .groupBy(col("source"))
      .agg(countDistinct(col("term")).as("n_exact"))
    exact.join(est, "source")
      .select(col("source"), col("n_exact"), col("hll_est"))
      .orderBy(col("source"))
  }

  /** Auditable Count-Min sketch (q130): frequency estimates for the
    * top-20 corpus terms next to their exact counts. Only the seeded
    * xxhash64 bucket assignment is engine-internal (dumped as
    * aux_cms_hashes); DuckDB re-derives the d x w counter matrix (pure
    * BIGINT sums over the re-tokenized corpus) and the min-over-rows
    * point estimates, so the whole estimation path hash-matches
    * exactly. SketchAccuracySpec gates the one-sided CMS guarantee
    * (never underestimates) and the Cormode-Muthukrishnan e/w error
    * bound. Scale: counters are d*w rows regardless of corpus size;
    * the only corpus-sized job is the map-side-combined term count.
    */
  val q130 = QueryDef.sql(
    "q130_cms_heavy_hitters",
    s"""WITH tc AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
       |                x -> x <> '')) AS term
       |        FROM documents)
       |  GROUP BY term),
       |h AS (
       |  SELECT term, h0, h1, h2, h3
       |  FROM read_parquet('__GRAFT_OUT__/aux_cms_hashes/*.parquet')),
       |probes AS (
       |  SELECT term, 0 AS j, h0 AS bucket FROM h
       |  UNION ALL SELECT term, 1, h1 FROM h
       |  UNION ALL SELECT term, 2, h2 FROM h
       |  UNION ALL SELECT term, 3, h3 FROM h),
       |counters AS (
       |  SELECT p.j, p.bucket, CAST(sum(tc.cnt) AS BIGINT) AS c
       |  FROM probes p JOIN tc ON tc.term = p.term
       |  GROUP BY p.j, p.bucket),
       |top AS (SELECT term, cnt FROM tc ORDER BY cnt DESC, term LIMIT 20),
       |est AS (
       |  SELECT p.term, CAST(min(c.c) AS BIGINT) AS n_cms
       |  FROM probes p
       |  JOIN counters c ON c.j = p.j AND c.bucket = p.bucket
       |  WHERE p.term IN (SELECT term FROM top)
       |  GROUP BY p.term)
       |SELECT top.term, top.cnt AS n_exact, est.n_cms
       |FROM top JOIN est USING (term)
       |ORDER BY n_exact DESC, term""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val tc = docs
      .select(explode(TextAnalytics.toks(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val hashes = Sketches.cmsHashes(docs)
    val counters = Sketches.cmsCounters(tc, hashes)
    val top = tc.orderBy(col("cnt").desc, col("term")).limit(20)
    val est = Sketches.cmsEstimates(top.select(col("term")), hashes, counters)
    top.join(est, "term")
      .select(col("term"), col("cnt").as("n_exact"), col("n_cms"))
      .orderBy(col("n_exact").desc, col("term"))
  }

  /** Hybrid sparse+dense retrieval with reciprocal-rank fusion (q188):
    * "related documents" for each query doc (doc_id < 5) from TWO
    * arms run over the whole corpus — Okapi BM25 (the q115 engine,
    * queried with the doc's own top-4 terms by (tf desc, term)) and
    * embedding cosine kNN (the q57 stub-embedding engine) — fused by
    * RRF: score(c) = Σ_arm 1/(60 + rank_arm(c)), the standard fusion
    * constant, summed sparse-then-dense in one fixed IEEE order. A
    * candidate missing from an arm contributes 0 from it. This is the
    * serving-stack shape every RAG/retrieval deployment runs (lexical
    * recall + semantic recall, union of shortlists, rank-only fusion
    * — RRF needs no score calibration between arms, which is the
    * point: BM25 scores and cosines are not comparable).
    *
    * Each arm excludes the query doc itself: BM25 retrieves top-(k+1)
    * then drops self and re-ranks by its own (score desc, id) order
    * (contiguous 1..k ranks — a rank GAP where self sat would leak
    * into the fused score); the kNN kernel never scores self. Ranks
    * are exact integers, so the only floats in the fusion are the two
    * literal divisions.
    *
    * Scale: the arms are the audited q115/q57 engines (postings built
    * once; the query side of both arms is query-count-sized and
    * broadcast); fusion is a shortlist-sized (|Q|·2k rows) full outer
    * join + window. TWO-STAGE ORACLE: DuckDB re-runs the ENTIRE
    * sparse arm from raw documents (the q115 chain with the per-doc
    * query derivation) and the ENTIRE dense arm from the dumped
    * deterministic embeddings (the q57 chain), then the fusion.
    */
  def hybridRetrieval(s: org.apache.spark.sql.SparkSession, dir: String,
                      nQ: Int = EvalNQ, k: Int = EvalK)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    // sparse arm: BM25 over the corpus postings, one query per doc
    val tokens = docs.select(col("doc_id"),
      explode(TextAnalytics.toks(col("text"))).as("term"))
    val n = docs.count()
    val tf = graft.index.Retrieval.postings(tokens).localCheckpoint(false)
    val wq = Window.partitionBy(col("qid")).orderBy(col("tf").desc, col("term"))
    val queries = tf.filter(col("doc_id") < nQ)
      .select(col("doc_id").as("qid"), col("term"), col("tf"))
      .withColumn("r", row_number().over(wq)).filter(col("r") <= EvalNTerms)
      .select(col("qid"), col("term"))
    hybridFromPostings(s, dir, tf, n, queries, nQ, k)
  }

  /** [[hybridRetrieval]] from a caller-held postings table + query set
    * — the serving form, and what keeps q200 (which already built the
    * identical postings for its other two arms) from paying a second
    * corpus token pass + exchange for the fused arm.
    */
  private[ops] def hybridFromPostings(s: org.apache.spark.sql.SparkSession,
                                      dir: String,
                                      tf: org.apache.spark.sql.DataFrame,
                                      n: Long,
                                      queries: org.apache.spark.sql.DataFrame,
                                      nQ: Int = EvalNQ, k: Int = EvalK)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val wS = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    val sparse = graft.index.Retrieval
      .searchBm25Postings(tf, queries, n, k = k + 1)
      .filter(col("doc_id") =!= col("qid"))
      .withColumn("rs", row_number().over(wS)).filter(col("rs") <= k)
      .select(col("qid"), col("doc_id").as("cid"),
        col("rs").cast("bigint").as("rs"))
    // dense arm: q57's deterministic stub embeddings, exact cosine kNN
    val emb = Multimodal.embedStub(s, Multimodal.attachMedia(docs))
      .toDF("vec_id", "v")
    val dense = Similarity
      .bruteForceKnn(emb.filter(col("vec_id") < nQ).toDF("qid", "qv"), emb, k)
      .select(col("qid"), col("cid"), col("rnk").cast("bigint").as("rd"))
    val wF = Window.partitionBy(col("qid")).orderBy(col("rrf").desc, col("cid"))
    sparse.join(dense, Seq("qid", "cid"), "full_outer")
      .select(col("qid"), col("cid"), col("rs"), col("rd"),
        (coalesce(lit(1.0) / (lit(60.0) + col("rs").cast("double")), lit(0.0))
          + coalesce(lit(1.0) / (lit(60.0) + col("rd").cast("double")), lit(0.0)))
          .as("rrf"))
      .withColumn("rnk", row_number().over(wF)).filter(col("rnk") <= k)
  }

  val q188 = QueryDef.sql(
    "q188_hybrid_rrf_retrieval",
    s"""WITH tk AS (
       |  SELECT doc_id,
       |    unnest(${TwinSql.toksSql}) AS term
       |  FROM documents),
       |n AS (SELECT count(*) AS n FROM documents),
       |tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
       |       FROM tk GROUP BY term, doc_id),
       |qs AS (
       |  SELECT qid, term FROM (
       |    SELECT doc_id AS qid, term,
       |      row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS r
       |    FROM tf WHERE doc_id < $EvalNQ)
       |  WHERE r <= $EvalNTerms),
       |tfdl AS (SELECT term, doc_id, tf,
       |         CAST(sum(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl
       |         FROM tf),
       |df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       |       FROM tk GROUP BY term),
       |idf AS (
       |  SELECT term,
       |    round(ln((CAST(n.n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
       |      / (CAST(df AS DOUBLE) + 0.5) + 1.0), 9) AS idf
       |  FROM df CROSS JOIN n),
       |ad AS (
       |  SELECT CAST(sum(dl0) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
       |  FROM (SELECT doc_id, count(*) AS dl0 FROM tk GROUP BY doc_id)),
       |w AS (
       |  SELECT tfdl.term, tfdl.doc_id,
       |    idf.idf * (CAST(tf AS DOUBLE) * 2.2
       |      / (CAST(tf AS DOUBLE)
       |         + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))) AS w
       |  FROM tfdl JOIN idf USING (term) CROSS JOIN ad),
       |m AS (SELECT qs.qid, w.doc_id, w.term, w.w FROM w JOIN qs USING (term)),
       |agg AS (
       |  SELECT qid, doc_id,
       |    list_sum(list(w ORDER BY term)) AS score
       |  FROM m GROUP BY qid, doc_id),
       |scut AS (
       |  SELECT qid, doc_id, score FROM (
       |    SELECT qid, doc_id, score,
       |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS r0
       |    FROM agg)
       |  WHERE r0 <= ${EvalK + 1}),
       |sarm AS (
       |  SELECT qid, cid, rs FROM (
       |    SELECT qid, doc_id AS cid,
       |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rs
       |    FROM scut WHERE doc_id <> qid)
       |  WHERE rs <= $EvalK),
       |e AS (
       |  SELECT vec_id, list(x ORDER BY pos) AS v
       |  FROM read_parquet('__GRAFT_OUT__/aux_mm_embed/*.parquet')
       |  GROUP BY vec_id),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $EvalNQ),
       |sden AS (
       |  SELECT qid, e.vec_id AS cid,
       |    ${cosSqlZ("qv", "v")} AS score
       |  FROM q CROSS JOIN e WHERE qid <> e.vec_id),
       |darm AS (
       |  SELECT qid, cid, rd FROM (
       |    SELECT qid, cid,
       |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rd
       |    FROM sden)
       |  WHERE rd <= $EvalK),
       |fu AS (
       |  SELECT COALESCE(s.qid, d.qid) AS qid, COALESCE(s.cid, d.cid) AS cid,
       |    s.rs, d.rd,
       |    COALESCE(1.0 / (60.0 + CAST(s.rs AS DOUBLE)), 0.0)
       |      + COALESCE(1.0 / (60.0 + CAST(d.rd AS DOUBLE)), 0.0) AS rrf
       |  FROM sarm s FULL OUTER JOIN darm d
       |    ON s.qid = d.qid AND s.cid = d.cid)
       |SELECT qid, cid, rs, rd, rrf, rnk FROM (
       |  SELECT qid, cid, rs, rd, rrf,
       |    row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, cid) AS rnk
       |  FROM fu)
       |WHERE rnk <= $EvalK
       |ORDER BY qid, rnk""".stripMargin) { (s, dir) =>
    hybridRetrieval(s, dir).orderBy(col("qid"), col("rnk"))
  }

  /** Cross-modal consistency audit (q196): the paired-modality dedup
    * readout — per doc pair flagged near-dup by EITHER modality over
    * the shared doc_id < 500 signature scope, which modality agrees:
    * `both_dup` (text MinHash-verified AND image dHash-verified),
    * `image_only` (duplicate pixels under different/absent captions —
    * the mirror-with-rewritten-alt-text case), `text_only` (duplicate
    * captions over different images — the template-caption case). A
    * multimodal dedup that trusts one modality silently keeps exactly
    * the off-diagonal pairs this table counts (the LAION-style paired
    * audit). The fourth cell (neither) is every other pair —
    * unbounded and meaningless, deliberately absent.
    *
    * Criteria are the shipped gates, not new ones: text =
    * [[Dedup.verifiedPairs]] (banded candidates + MinHash slot
    * agreement ≥ 0.7 — the q132/q173 criterion), image =
    * [[Dedup.simhashBandPairs]] over [[Multimodal.phashSig64]] at
    * hamming ≤ 10 (the q177 operating point). A NULL-text doc has no
    * shingle signature, so its pairs can only surface as `image_only`
    * — caption-absent counts as caption-different (documented, the
    * audit's point).
    *
    * Scale: both arms are banded equi-joins (never all-pairs); the
    * classification is one full-outer join of two pair shortlists +
    * a 3-row aggregate. TWO-STAGE ORACLE: DuckDB re-derives the text
    * arm from aux_minhash_sig32 (the q173 chain) and the image arm
    * from aux_phash64 (the q177 chain), then the same join +
    * classification. Bounded slice — the q45 signature scope
    * (ScaleCheck exclusion reasoning as q173's).
    */
  def crossModalConsistency(s: org.apache.spark.sql.SparkSession,
                            docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val sigs = Dedup.minhashSignatures(docs).localCheckpoint(false)
    val txt = Dedup.verifiedPairs(sigs)
      .select(col("d1"), col("d2"), lit(1L).as("is_txt"))
    val img = Dedup.simhashBandPairs(
      Multimodal.phashSig64(s, Multimodal.attachSyntheticImages(s, docs)),
      maxHamming = 10)
      .select(col("d1"), col("d2"), lit(1L).as("is_img"))
    val u = txt.join(img, Seq("d1", "d2"), "full_outer")
      .select(col("d1"), col("d2"),
        when(col("is_txt").isNotNull && col("is_img").isNotNull, "both_dup")
          .when(col("is_img").isNotNull, "image_only")
          .otherwise("text_only").as("cls"))
    val pairs = u.groupBy(col("cls"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"))
    val docsIn = u
      .select(col("cls"), explode(array(col("d1"), col("d2"))).as("d"))
      .groupBy(col("cls"))
      .agg(countDistinct(col("d")).cast("bigint").as("n_docs"))
    pairs.join(docsIn, Seq("cls"))
  }

  val q196 = QueryDef.sql(
    "q196_crossmodal_consistency",
    """WITH s AS (
      |  SELECT doc_id, list(h ORDER BY pos) AS mh
      |  FROM read_parquet('__GRAFT_OUT__/aux_minhash_sig32/*.parquet')
      |  GROUP BY doc_id),
      |b AS (
      |  SELECT doc_id, g.b AS band, list_slice(mh, g.b*4 + 1, g.b*4 + 4) AS key
      |  FROM s CROSS JOIN (SELECT unnest(range(8)) AS b) g),
      |cand AS (
      |  SELECT a.doc_id AS d1, c.doc_id AS d2
      |  FROM b a JOIN b c ON a.band = c.band AND a.key = c.key AND a.doc_id < c.doc_id
      |  GROUP BY d1, d2),
      |m AS (
      |  SELECT cand.d1, cand.d2,
      |    CAST(len(list_filter(range(1, 33), i -> s1.mh[i] = s2.mh[i])) AS BIGINT)
      |      AS n_match
      |  FROM cand JOIN s s1 ON s1.doc_id = cand.d1
      |            JOIN s s2 ON s2.doc_id = cand.d2),
      |tp AS (SELECT d1, d2 FROM m WHERE CAST(n_match AS DOUBLE) / 32.0 >= 0.7),
      |ph AS (
      |  SELECT doc_id, sig
      |  FROM read_parquet('__GRAFT_OUT__/aux_phash64/*.parquet')
      |  WHERE doc_id < 500),
      |pb AS (
      |  SELECT doc_id, sig, g.b AS b, ((sig >> (g.b * 16)) & 65535) AS band
      |  FROM ph CROSS JOIN (SELECT unnest(range(4)) AS b) g),
      |pp AS (
      |  SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2,
      |    a.sig AS s1, c.sig AS s2
      |  FROM pb a JOIN pb c
      |    ON a.b = c.b AND a.band = c.band AND a.doc_id < c.doc_id),
      |ip AS (
      |  SELECT d1, d2 FROM pp WHERE bit_count(xor(s1, s2)) <= 10),
      |u AS (
      |  SELECT COALESCE(t.d1, i.d1) AS d1, COALESCE(t.d2, i.d2) AS d2,
      |    CASE WHEN t.d1 IS NOT NULL AND i.d1 IS NOT NULL THEN 'both_dup'
      |         WHEN i.d1 IS NOT NULL THEN 'image_only'
      |         ELSE 'text_only' END AS cls
      |  FROM tp t FULL OUTER JOIN ip i ON t.d1 = i.d1 AND t.d2 = i.d2),
      |cp AS (
      |  SELECT cls, CAST(count(*) AS BIGINT) AS n_pairs FROM u GROUP BY cls),
      |cd AS (
      |  SELECT cls, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
      |  FROM (SELECT cls, unnest([d1, d2]) AS d FROM u) GROUP BY cls)
      |SELECT cp.cls, cp.n_pairs, cd.n_docs
      |FROM cp JOIN cd USING (cls)
      |ORDER BY cls""".stripMargin) { (s, dir) =>
    crossModalConsistency(s,
      Tables.documents(s, dir).filter(col("doc_id") < 500))
      .orderBy(col("cls"))
  }

  /** The shared eval context of q200/q206: token stream, corpus size,
    * postings, and the planted query set (top-4 terms of the first nQ
    * docs). ONE definition so the sweep and the eval grade the same
    * queries over the same index.
    */
  private def evalContext(s: org.apache.spark.sql.SparkSession, dir: String,
                          nQ: Int)
      : (org.apache.spark.sql.DataFrame, Long,
         org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val tokens = docs.select(col("doc_id"),
      explode(TextAnalytics.toks(col("text"))).as("term"))
    val n = docs.count()
    val tf = graft.index.Retrieval.postings(tokens).localCheckpoint(false)
    val wq = Window.partitionBy(col("qid")).orderBy(col("tf").desc, col("term"))
    val queries = tf.filter(col("doc_id") < nQ)
      .select(col("doc_id").as("qid"), col("term"), col("tf"))
      .withColumn("r", row_number().over(wq)).filter(col("r") <= EvalNTerms)
      .select(col("qid"), col("term"))
    (tokens, n, tf, queries)
  }

  /** The q188/q200 arm shaper: top-(k+1), drop self, re-rank to
    * contiguous 1..k (the self-exclusion rule), tagged with a system
    * name.
    */
  private def armOf(res: org.apache.spark.sql.DataFrame, sys: String, k: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wS = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    res.filter(col("doc_id") =!= col("qid"))
      .withColumn("rk", row_number().over(wS)).filter(col("rk") <= k)
      .select(lit(sys).as("system"), col("qid"),
        col("doc_id").as("cid"), col("rk").cast("bigint").as("rk"))
  }

  /** Retrieval-quality eval harness (q200): recall@10 and nDCG@10 of
    * the THREE shipped retrieval systems — TF-IDF (the q114 engine),
    * Okapi BM25 (q115), and hybrid RRF (the q188 fusion) — against a
    * PLANTED graded relevance set, per query. The q57 planted-pair
    * discipline applied to retrieval: q188's RRF is defended by a
    * measured number, not by shape.
    *
    * Relevance is defined INDEPENDENTLY of every system's score:
    * graded rel(q, c) = min(3, (10·|Tq ∩ Tc|) div |Tq ∪ Tc|) over
    * exact DISTINCT-token sets — integer Jaccard deciles capped at 3
    * (q195's exact-rational discipline; no float threshold), relevant
    * iff grade ≥ 1. Lexical overlap favors no arm a priori: BM25/TFIDF
    * see only the 4-term query, not the full token set, and the dense
    * arm sees stub embeddings.
    *
    * Float discipline: ranks, grades, and DCG sums are exact integers
    * — the per-rank weight w_r = round(10⁶·ln 2 / ln(r+1)) is the
    * lnMicro single-rounding rule applied to the nDCG discount (one
    * libm expression, one rounding, identical formula both engines),
    * so DCG_micro = Σ grade·w_r is order-free; recall and ndcg are
    * final literal divisions. IDCG ranks the relevance set itself
    * (grade desc — ties irrelevant to the sum). n_rel counts the
    * query's full relevant set; a query with none reports 0.0 metrics.
    *
    * Scale: ONE postings build feeds both lexical arms; the relevance
    * join is query-side-bounded (5 query token sets broadcast against
    * the corpus token stream — linear, never all-pairs); metrics are
    * shortlist-sized. The dense arm is the q57/q188 engine. ORACLE:
    * full replay — the q188 twin chain (both arms + fusion from raw
    * documents + aux_mm_embed) extended with the TF-IDF arm, the
    * relevance derivation, and the metric arithmetic.
    */
  def retrievalEval(s: org.apache.spark.sql.SparkSession, dir: String,
                    nQ: Int = EvalNQ, k: Int = EvalK)
      : org.apache.spark.sql.DataFrame = {
    val (tokens, n, tf, queries) = evalContext(s, dir, nQ)
    def arm(res: org.apache.spark.sql.DataFrame, sys: String) =
      armOf(res, sys, k)
    val tfidfArm = arm(
      graft.index.Retrieval.searchPostings(tf, queries, n, k + 1), "tfidf")
    val bm25Arm = arm(
      graft.index.Retrieval.searchBm25Postings(tf, queries, n, k + 1), "bm25")
    val rrfArm = hybridFromPostings(s, dir, tf, n, queries, nQ, k)
      .select(lit("rrf").as("system"), col("qid"), col("cid"),
        col("rnk").cast("bigint").as("rk"))
    val ranked = tfidfArm.unionByName(bm25Arm).unionByName(rrfArm)
    gradeRankedArms(tokens, ranked, nQ, k)
  }

  /** (qid, cid, n_common, nq, nc) exact distinct-token overlap stats
    * of every candidate against every planted query doc — the ONE
    * sufficient statistic behind the graded relevance (rel) AND the
    * q206 tau comparisons; a drifted copy would grade and rank-check
    * against different overlap sets.
    */
  private def jaccStats(tokens: org.apache.spark.sql.DataFrame, nQ: Int)
      : org.apache.spark.sql.DataFrame = {
    val dt = tokens.distinct().localCheckpoint(false)
    val qt = dt.filter(col("doc_id") < nQ).toDF("qid", "term")
    val qsz = qt.groupBy(col("qid")).agg(count(lit(1)).as("nq"))
    val csz = dt.groupBy(col("doc_id")).agg(count(lit(1)).as("nc"))
      .toDF("cid", "nc")
    dt.toDF("cid", "term")
      .join(broadcast(qt), Seq("term"))
      .filter(col("cid") =!= col("qid"))
      .groupBy(col("qid"), col("cid"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(qsz), Seq("qid"))
      .join(csz, Seq("cid"))
      .select(col("qid"), col("cid"),
        col("n_common").cast("bigint").as("n_common"),
        col("nq").cast("bigint").as("nq"), col("nc").cast("bigint").as("nc"))
  }

  /** The shared grading tail of q200/q206: planted graded relevance
    * (exact distinct-token Jaccard deciles, query side bounded and
    * broadcast) + recall@k / nDCG@k of a (system, qid, cid, rk)
    * frame. ONE metric definition — a sweep graded by a drifted copy
    * would tune against a different target than the eval reports.
    */
  private def gradeRankedArms(tokens: org.apache.spark.sql.DataFrame,
                              ranked: org.apache.spark.sql.DataFrame,
                              nQ: Int, k: Int,
                              // precomputed jaccStats (q206 shares one
                              // build between grading and tau)
                              jstats: Option[org.apache.spark.sql.DataFrame] =
                                None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rel = jstats.getOrElse(jaccStats(tokens, nQ))
      .select(col("qid"), col("cid"),
        least(lit(3L), expr("(10 * n_common) div (nq + nc - n_common)"))
          .cast("bigint").as("grade"))
      .filter(col("grade") >= 1L)
      .localCheckpoint(false)
    // per-rank micro discount, single-rounded (see doc comment)
    def wOf(r: org.apache.spark.sql.Column) =
      round(lit(1000000.0) * log(lit(2.0)) / log(r.cast("double") + lit(1.0)))
        .cast("bigint")
    val hits = ranked.join(rel, Seq("qid", "cid"), "left")
      .select(col("system"), col("qid"),
        when(col("grade").isNotNull, 1L).otherwise(0L).as("hit"),
        coalesce(col("grade"), lit(0L)).as("g"), col("rk"))
      .groupBy(col("system"), col("qid"))
      .agg(sum(col("hit")).cast("bigint").as("n_hits"),
        sum(col("g") * wOf(col("rk"))).cast("bigint").as("dcg_micro"))
    val wI = Window.partitionBy(col("qid"))
      .orderBy(col("grade").desc, col("cid"))
    val ideal = rel
      .withColumn("rk", row_number().over(wI)).filter(col("rk") <= k)
      .groupBy(col("qid"))
      .agg(sum(col("grade") * wOf(col("rk"))).cast("bigint").as("idcg_micro"))
    val nRel = rel.groupBy(col("qid"))
      .agg(count(lit(1)).cast("bigint").as("n_rel"))
    hits
      .join(broadcast(nRel), Seq("qid"), "left")
      .join(broadcast(ideal), Seq("qid"), "left")
      .select(col("system"), col("qid"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"), col("n_hits"),
        when(coalesce(col("n_rel"), lit(0L)) > 0L,
          col("n_hits").cast("double") / col("n_rel").cast("double"))
          .otherwise(lit(0.0)).as("recall"),
        col("dcg_micro"),
        coalesce(col("idcg_micro"), lit(0L)).as("idcg_micro"),
        when(coalesce(col("idcg_micro"), lit(0L)) > 0L,
          col("dcg_micro").cast("double") / col("idcg_micro").cast("double"))
          .otherwise(lit(0.0)).as("ndcg"))
  }

  /** q200/q206 shared twin fragments — the corpus/query head, the
    * BM25 sufficient statistics, the parameterized BM25 scoring arm,
    * and the relevance+metrics tail. Extracted so the q206 sweep's
    * twin is the SAME chain at other (k1, b) points, not a copy that
    * could drift (the knChainSql argument). `bm25ArmSql` interpolates
    * the driver-folded doubles (k1+1, 1-b) exactly as the Scala side
    * folds them — Double.toString round-trips, so both engines embed
    * the identical literal.
    */
  private def evalHeadSql(nQ: Int): String =
    s"""tk AS (
       |  SELECT doc_id,
       |    unnest(${TwinSql.toksSql}) AS term
       |  FROM documents),
       |n AS (SELECT count(*) AS n FROM documents),
       |tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
       |       FROM tk GROUP BY term, doc_id),
       |qs AS (
       |  SELECT qid, term FROM (
       |    SELECT doc_id AS qid, term,
       |      row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term) AS r
       |    FROM tf WHERE doc_id < $nQ)
       |  WHERE r <= $EvalNTerms),
       |df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       |       FROM tk GROUP BY term)""".stripMargin

  private val bm25StatsSql: String =
    """tfdl AS (SELECT term, doc_id, tf,
      |         CAST(sum(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl
      |         FROM tf),
      |idf AS (
      |  SELECT term,
      |    round(ln((CAST(n.n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
      |      / (CAST(df AS DOUBLE) + 0.5) + 1.0), 9) AS idf
      |  FROM df CROSS JOIN n),
      |ad AS (
      |  SELECT CAST(sum(dl0) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      |  FROM (SELECT doc_id, count(*) AS dl0 FROM tk GROUP BY doc_id))""".stripMargin

  /** One BM25 scoring arm at (k1, b): CTEs w$sfx..arm$sfx emitting
    * (system, qid, cid, rk) rows named `sys`.
    */
  private def bm25ArmSql(sys: String, sfx: String, k1: Double,
                         b: Double, k: Int = EvalK): String =
    s"""w$sfx AS (
       |  SELECT tfdl.term, tfdl.doc_id,
       |    idf.idf * (CAST(tf AS DOUBLE) * ${k1 + 1.0}
       |      / (CAST(tf AS DOUBLE)
       |         + $k1 * (${1.0 - b} + $b * CAST(dl AS DOUBLE) / avgdl))) AS w
       |  FROM tfdl JOIN idf USING (term) CROSS JOIN ad),
       |m$sfx AS (SELECT qs.qid, w$sfx.doc_id, w$sfx.term, w$sfx.w
       |          FROM w$sfx JOIN qs USING (term)),
       |agg$sfx AS (
       |  SELECT qid, doc_id, list_sum(list(w ORDER BY term)) AS score
       |  FROM m$sfx GROUP BY qid, doc_id),
       |scut$sfx AS (
       |  SELECT qid, doc_id, score FROM (
       |    SELECT qid, doc_id, score,
       |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS r0
       |    FROM agg$sfx)
       |  WHERE r0 <= ${k + 1}),
       |arm$sfx AS (
       |  SELECT '$sys' AS system, qid, cid, rk FROM (
       |    SELECT qid, doc_id AS cid,
       |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rk
       |    FROM scut$sfx WHERE doc_id <> qid)
       |  WHERE rk <= $k)""".stripMargin

  private def evalMetricsCtes(nQ: Int, k: Int): String =
    s"""dt AS (SELECT DISTINCT doc_id, term FROM tk),
      |qt AS (SELECT doc_id AS qid, term FROM dt WHERE doc_id < $nQ),
      |qsz AS (SELECT qid, CAST(count(*) AS BIGINT) AS nq FROM qt GROUP BY qid),
      |csz AS (SELECT doc_id AS cid, CAST(count(*) AS BIGINT) AS nc
      |        FROM dt GROUP BY doc_id),
      |jstats AS (
      |  SELECT j.qid, j.cid, j.n_common, qsz.nq, csz.nc
      |  FROM (
      |    SELECT qt.qid, dt.doc_id AS cid, CAST(count(*) AS BIGINT) AS n_common
      |    FROM dt JOIN qt USING (term)
      |    WHERE dt.doc_id <> qt.qid
      |    GROUP BY qt.qid, dt.doc_id) j
      |  JOIN qsz USING (qid) JOIN csz USING (cid)),
      |rel AS (
      |  SELECT qid, cid, grade FROM (
      |    SELECT qid, cid,
      |      least(3, (10 * n_common) // (nq + nc - n_common)) AS grade
      |    FROM jstats)
      |  WHERE grade >= 1),
      |hits AS (
      |  SELECT r.system, r.qid,
      |    CAST(sum(CASE WHEN rel.grade IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_hits,
      |    CAST(sum(COALESCE(rel.grade, 0)
      |      * CAST(round(1000000.0 * ln(2.0) / ln(CAST(r.rk AS DOUBLE) + 1.0))
      |          AS BIGINT)) AS BIGINT) AS dcg_micro
      |  FROM ranked r LEFT JOIN rel ON rel.qid = r.qid AND rel.cid = r.cid
      |  GROUP BY r.system, r.qid),
      |ideal AS (
      |  SELECT qid,
      |    CAST(sum(grade
      |      * CAST(round(1000000.0 * ln(2.0) / ln(CAST(rk AS DOUBLE) + 1.0))
      |          AS BIGINT)) AS BIGINT) AS idcg_micro
      |  FROM (
      |    SELECT qid, grade,
      |      row_number() OVER (PARTITION BY qid ORDER BY grade DESC, cid) AS rk
      |    FROM rel)
      |  WHERE rk <= $k GROUP BY qid),
      |nr AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_rel FROM rel GROUP BY qid),
      |metrics AS (
      |  SELECT hits.system, hits.qid,
      |    CAST(COALESCE(nr.n_rel, 0) AS BIGINT) AS n_rel, hits.n_hits,
      |    CASE WHEN COALESCE(nr.n_rel, 0) > 0
      |      THEN CAST(hits.n_hits AS DOUBLE) / CAST(nr.n_rel AS DOUBLE)
      |      ELSE 0.0 END AS recall,
      |    hits.dcg_micro,
      |    CAST(COALESCE(ideal.idcg_micro, 0) AS BIGINT) AS idcg_micro,
      |    CASE WHEN COALESCE(ideal.idcg_micro, 0) > 0
      |      THEN CAST(hits.dcg_micro AS DOUBLE) / CAST(ideal.idcg_micro AS DOUBLE)
      |      ELSE 0.0 END AS ndcg
      |  FROM hits LEFT JOIN nr USING (qid) LEFT JOIN ideal USING (qid))""".stripMargin

  val q200 = QueryDef.sql(
    "q200_retrieval_eval",
    s"""WITH ${evalHeadSql(EvalNQ)},
       |tw AS (
       |  SELECT tf.term, tf.doc_id,
       |    round(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)), 9) AS w
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |tm AS (SELECT qs.qid, tw.doc_id, tw.term, tw.w FROM tw JOIN qs USING (term)),
       |tagg AS (
       |  SELECT qid, doc_id, list_sum(list(w ORDER BY term)) AS score
       |  FROM tm GROUP BY qid, doc_id),
       |tcut AS (
       |  SELECT qid, doc_id, score FROM (
       |    SELECT qid, doc_id, score,
       |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS r0
       |    FROM tagg)
       |  WHERE r0 <= ${EvalK + 1}),
       |tarm AS (
       |  SELECT 'tfidf' AS system, qid, cid, rk FROM (
       |    SELECT qid, doc_id AS cid,
       |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rk
       |    FROM tcut WHERE doc_id <> qid)
       |  WHERE rk <= $EvalK),
       |$bm25StatsSql,
       |${bm25ArmSql("bm25", "b", 1.2, 0.75, EvalK)},
       |e AS (
       |  SELECT vec_id, list(x ORDER BY pos) AS v
       |  FROM read_parquet('__GRAFT_OUT__/aux_mm_embed/*.parquet')
       |  GROUP BY vec_id),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $EvalNQ),
       |sden AS (
       |  SELECT qid, e.vec_id AS cid,
       |    ${cosSqlZ("qv", "v")} AS score
       |  FROM q CROSS JOIN e WHERE qid <> e.vec_id),
       |darm AS (
       |  SELECT qid, cid, rd FROM (
       |    SELECT qid, cid,
       |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rd
       |    FROM sden)
       |  WHERE rd <= $EvalK),
       |sarm AS (
       |  SELECT qid, cid, rk AS rs FROM armb),
       |fu AS (
       |  SELECT COALESCE(s.qid, d.qid) AS qid, COALESCE(s.cid, d.cid) AS cid,
       |    COALESCE(1.0 / (60.0 + CAST(s.rs AS DOUBLE)), 0.0)
       |      + COALESCE(1.0 / (60.0 + CAST(d.rd AS DOUBLE)), 0.0) AS rrf
       |  FROM sarm s FULL OUTER JOIN darm d
       |    ON s.qid = d.qid AND s.cid = d.cid),
       |rarm AS (
       |  SELECT 'rrf' AS system, qid, cid, rk FROM (
       |    SELECT qid, cid,
       |      row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, cid) AS rk
       |    FROM fu)
       |  WHERE rk <= $EvalK),
       |ranked AS (
       |  SELECT * FROM tarm UNION ALL SELECT * FROM armb
       |  UNION ALL SELECT * FROM rarm),
       |${evalMetricsCtes(EvalNQ, EvalK)}
       |SELECT system, qid, n_rel, n_hits, recall, dcg_micro, idcg_micro,
       |  ndcg
       |FROM metrics ORDER BY system, qid""".stripMargin) { (s, dir) =>
    retrievalEval(s, dir).orderBy(col("system"), col("qid"))
  }

  /** The q206 sweep grid: k1 varied at the shipped b and b varied at
    * the shipped k1, bracketing the (1.2, 0.75) default the engine
    * serves (q115/q188/q200). One axis at a time so a win is
    * attributable; the default point itself is in the grid, so the
    * sweep row for it must EQUAL q200's bm25 row — the cross-query
    * consistency the spec pins.
    */
  private[ops] val bm25Grid: Seq[(Double, Double)] = Seq(
    (0.6, 0.75), (1.2, 0.75), (2.0, 0.75),
    (1.2, 0.0), (1.2, 0.4), (1.2, 1.0))

  private def bm25SysName(k1: Double, b: Double): String =
    s"bm25_k1=${k1}_b=$b"

  /** BM25 operating-point sweep (q206): recall@10 / nDCG@10 of every
    * grid point against the SAME planted graded relevance q200 grades
    * with — the q172/q191 tuning-curve discipline applied to the
    * retrieval ranker, so the shipped (k1=1.2, b=0.75) default is
    * defended by a measured curve rather than Lucene's word. The
    * postings/doc-length/idf statistics are computed ONCE and shared
    * by all grid points (only the saturation arithmetic differs per
    * point — a narrow reweight, not a re-index), matching how a real
    * tuning run amortizes the index build.
    *
    * Scale: q200's corpus-side shape once (postings build), then per
    * grid point one posting-sized reweight + the query-bounded
    * broadcast join — the grid multiplies only the cheap arm, never
    * the index build. FULL-REPLAY ORACLE: the shared twin fragments
    * (evalHeadSql / bm25StatsSql / bm25ArmSql / evalMetricsSql — the
    * exact q200 chain) instantiated at every grid point.
    */
  def bm25TuningCurve(s: org.apache.spark.sql.SparkSession, dir: String,
                      nQ: Int = EvalNQ, k: Int = EvalK)
      : org.apache.spark.sql.DataFrame = {
    val (tokens, n, tf, queries) = evalContext(s, dir, nQ)
    // ONE stats build (tfdl/idf/avgdl) shared by every grid arm — the
    // twin's single CTE set, mirrored; each localCheckpoint'd frame is
    // consumed by all six arms
    val st0 = graft.index.Retrieval.bm25Stats(tf, n)
    val stats = graft.index.Retrieval.Bm25Stats(
      st0.tfdl.localCheckpoint(false), st0.idf.localCheckpoint(false),
      st0.avgdl.localCheckpoint(false))
    // EAGER checkpoint: metrics and tau both traverse the six arms,
    // and without it each branch re-ran every reweight+window
    // (measured ~10s -> ~6s at sf0.1). The arms' avgdl broadcasts
    // disappear from the audited plan behind it; the identical
    // searchBm25FromStats path stays plan-audited through q115/q188/
    // q200 (PlanAuditSpec carries the matching comment)
    val ranked = bm25Grid.map { case (k1, b) =>
      armOf(graft.index.Retrieval.searchBm25FromStats(stats, queries, k + 1,
        k1, b), bm25SysName(k1, b), k)
    }.reduce(_ unionByName _).localCheckpoint()
    val js = jaccStats(tokens, nQ).localCheckpoint(false)
    val metrics = gradeRankedArms(tokens, ranked, nQ, k, Some(js))
    // Kendall-tau agreement of each arm's top-k ORDER with the exact
    // Jaccard order — the metric that still discriminates when the
    // fixture's relevant set dwarfs k and nDCG saturates at 1.0:
    // every comparison is an integer cross-multiplication (j1 > j2
    // iff c1*u2 > c2*u1), so tau is exact on both engines
    val rkj = ranked.join(js, Seq("qid", "cid"), "left")
      .select(col("system"), col("qid"), col("rk"),
        coalesce(col("n_common"), lit(0L)).as("c"),
        coalesce(col("nq") + col("nc") - col("n_common"), lit(1L)).as("u"))
      .localCheckpoint(false) // self-joined below
    val tpairs = rkj.toDF("system", "qid", "r1", "c1", "u1")
      .join(rkj.toDF("system", "qid", "r2", "c2", "u2"),
        Seq("system", "qid"))
      .filter(col("r1") < col("r2"))
      .select(col("system"), col("qid"),
        when(col("c1") * col("u2") > col("c2") * col("u1"), 1L)
          .otherwise(0L).as("conc"),
        when(col("c1") * col("u2") < col("c2") * col("u1"), 1L)
          .otherwise(0L).as("disc"))
    val tau = tpairs.groupBy(col("system"), col("qid"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"),
        sum(col("conc")).cast("bigint").as("n_conc"),
        sum(col("disc")).cast("bigint").as("n_disc"))
      .withColumn("tau", when(col("n_pairs") > 0,
          (col("n_conc") - col("n_disc")).cast("double")
            / col("n_pairs").cast("double"))
        .otherwise(lit(0.0)))
    // LEFT join with empty-tau defaults: a query with < 2 ranked
    // candidates has no pairs — it must stay IN the sweep with
    // n_pairs = 0 (dropping it would silently shrink the query set
    // vs q200)
    metrics.join(tau, Seq("system", "qid"), "left")
      .select(col("system"), col("qid"), col("n_rel"), col("n_hits"),
        col("recall"), col("dcg_micro"), col("idcg_micro"), col("ndcg"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_conc"), lit(0L)).as("n_conc"),
        coalesce(col("n_disc"), lit(0L)).as("n_disc"),
        coalesce(col("tau"), lit(0.0)).as("tau"))
  }

  val q206 = QueryDef.sql(
    "q206_bm25_tuning_curve",
    s"""WITH ${evalHeadSql(EvalNQ)},
       |$bm25StatsSql,
       |${bm25Grid.zipWithIndex.map { case ((k1, b), i) =>
           bm25ArmSql(bm25SysName(k1, b), s"g$i", k1, b)
         }.mkString(",\n")},
       |ranked AS (
       |  ${bm25Grid.indices.map(i => s"SELECT * FROM armg$i")
           .mkString("\n  UNION ALL ")}),
       |${evalMetricsCtes(EvalNQ, EvalK)},
       |rkj AS (
       |  SELECT r.system, r.qid, r.rk,
       |    CAST(COALESCE(js.n_common, 0) AS BIGINT) AS c,
       |    CAST(COALESCE(js.nq + js.nc - js.n_common, 1) AS BIGINT) AS u
       |  FROM ranked r LEFT JOIN jstats js
       |    ON js.qid = r.qid AND js.cid = r.cid),
       |tpairs AS (
       |  SELECT a.system, a.qid,
       |    CASE WHEN a.c * b.u > b.c * a.u THEN 1 ELSE 0 END AS conc,
       |    CASE WHEN a.c * b.u < b.c * a.u THEN 1 ELSE 0 END AS disc
       |  FROM rkj a JOIN rkj b
       |    ON a.system = b.system AND a.qid = b.qid AND a.rk < b.rk),
       |tau AS (
       |  SELECT system, qid,
       |    CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(conc) AS BIGINT) AS n_conc,
       |    CAST(sum(disc) AS BIGINT) AS n_disc,
       |    CASE WHEN count(*) > 0
       |      THEN CAST(sum(conc) - sum(disc) AS DOUBLE)
       |           / CAST(count(*) AS DOUBLE)
       |      ELSE 0.0 END AS tau
       |  FROM tpairs GROUP BY system, qid)
       |SELECT m.system, m.qid, m.n_rel, m.n_hits, m.recall, m.dcg_micro,
       |  m.idcg_micro, m.ndcg,
       |  CAST(COALESCE(tau.n_pairs, 0) AS BIGINT) AS n_pairs,
       |  CAST(COALESCE(tau.n_conc, 0) AS BIGINT) AS n_conc,
       |  CAST(COALESCE(tau.n_disc, 0) AS BIGINT) AS n_disc,
       |  COALESCE(tau.tau, 0.0) AS tau
       |FROM metrics m LEFT JOIN tau USING (system, qid)
       |ORDER BY system, qid""".stripMargin) { (s, dir) =>
    bm25TuningCurve(s, dir).orderBy(col("system"), col("qid"))
  }

  /** CLIP-style hard-negative mining over the paired image/text
    * embedding spaces (q204): for each anchor image, the highest-
    * cosine NON-PAIR text embeddings — the in-batch negatives a
    * contrastive multimodal trainer wants hardest, plus the margin
    * pos_sim - neg_sim that prices how confusable the pair actually
    * is (a negative margin row IS a mislabeled-pair candidate: some
    * other caption matches this image better than its own).
    *
    * Image side = the q57 stub kernel over the attached media bytes;
    * text side = the SAME kernel over the document's own UTF-8 bytes
    * ([[Multimodal.attachTextBytes]] — a real pipeline runs a text
    * encoder; the plumbing is what ships). Self-pair exclusion is the
    * positive-pair exclusion by construction (vec_id = doc_id on both
    * sides).
    *
    * Scale: the anchor batch is bounded (doc_id < 20 — the q53/q164
    * audit-batch convention, ScaleCheck-excluded), so the mining is
    * the broadcast brute-force scan over the text corpus; the
    * corpus-scale path swaps [[Similarity.bruteForceKnn]] for the
    * shipped IVF/LSH serving (q53's probe join) unchanged, since the
    * miner consumes only (qid, cid, score, rnk).
    *
    * TWO-STAGE ORACLE: both embedding tables are dumped
    * (aux_mm_embed / aux_txt_embed); DuckDB re-derives the positive
    * similarity, the full negative scan, ranking, and margins.
    */
  val q204 = QueryDef.sql(
    "q204_hard_negative_mining",
    s"""WITH ti AS (
       |  SELECT vec_id, list(x ORDER BY pos) AS v
       |  FROM read_parquet('__GRAFT_OUT__/aux_txt_embed/*.parquet')
       |  GROUP BY vec_id),
       |im AS (
       |  SELECT vec_id, list(x ORDER BY pos) AS v
       |  FROM read_parquet('__GRAFT_OUT__/aux_mm_embed/*.parquet')
       |  GROUP BY vec_id),
       |anchors AS (SELECT vec_id AS qid, v AS qv FROM im WHERE vec_id < 20),
       |pos AS (
       |  SELECT qid, ${cosSqlZ("qv", "ti.v")} AS pos_sim
       |  FROM anchors JOIN ti ON ti.vec_id = anchors.qid),
       |neg AS (
       |  SELECT qid, ti.vec_id AS neg_id, ${cosSqlZ("qv", "ti.v")} AS neg_sim
       |  FROM anchors CROSS JOIN ti WHERE ti.vec_id <> qid),
       |rk AS (
       |  SELECT qid, neg_id, neg_sim,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY neg_sim DESC, neg_id) AS rnk
       |  FROM neg)
       |SELECT rk.qid, CAST(rk.rnk AS BIGINT) AS rnk, rk.neg_id,
       |  p.pos_sim, rk.neg_sim,
       |  p.pos_sim - rk.neg_sim AS margin
       |FROM rk JOIN pos p USING (qid)
       |WHERE rk.rnk <= 3
       |ORDER BY rk.qid, rk.rnk""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val img = Multimodal.embedStub(s, Multimodal.attachMedia(docs))
      .toDF("vec_id", "v")
    val txt = Multimodal.embedStub(s, Multimodal.attachTextBytes(docs))
      .toDF("vec_id", "v")
      .localCheckpoint(false) // consumed twice: positive join + scan
    val anchors = img.filter(col("vec_id") < 20).toDF("qid", "qv")
    val posSim = anchors
      .join(txt.toDF("qid", "pv"), Seq("qid"))
      .select(col("qid"), graft.functions.functions
        .cosine_similarity(col("qv"), col("pv")).as("pos_sim"))
    Similarity.bruteForceKnn(anchors, txt, k = 3)
      .join(posSim, Seq("qid"))
      .select(col("qid"), col("rnk").cast("bigint").as("rnk"),
        col("cid").as("neg_id"), col("pos_sim"),
        col("score").as("neg_sim"),
        (col("pos_sim") - col("score")).as("margin"))
      .orderBy(col("qid"), col("rnk"))
  }
}
