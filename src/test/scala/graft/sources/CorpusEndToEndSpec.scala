package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.cluster.KMeansAssign
import graft.index.InvertedIndex
import graft.text.Normalize
import org.apache.spark.sql.functions._

/** End-to-end golden test of the full reference pipeline over the
  * FIXTURES.md §A micro-corpus, from on-disk text files through
  * tokenize/stopword/stem -> presence matrix -> cosine assignment ->
  * clusters, asserting the hand-computed golden results.
  */
class CorpusEndToEndSpec extends SparkSpec {
  import spark.implicits._

  def writeCorpus(): (String, String, String) = {
    val dir = Files.createTempDirectory("graft-corpus")
    val docs = dir.resolve("docs")
    Files.createDirectories(docs)
    Files.writeString(docs.resolve("1.txt"), "the cats meeting agreed")
    Files.writeString(docs.resolve("2.txt"), "ponies ties cats!")
    Files.writeString(docs.resolve("3.txt"), "agreed, meetings matting")
    Files.writeString(dir.resolve("stopwords.txt"), "the")
    Files.writeString(dir.resolve("centers.txt"), "[1,1,0,]\n[0,0,1,]\n")
    (docs.toString, dir.resolve("stopwords.txt").toString,
      dir.resolve("centers.txt").toString)
  }

  test("full reference pipeline: corpus dir -> index -> clusters (golden)") {
    val (docsDir, stopPath, centersPath) = writeCorpus()

    // S1/S2: directory scan with filename-derived doc ids
    val docs = Corpus.readDocs(spark, docsDir)
    assert(docs.select("doc_id").as[Int].collect().sorted.toList == List(1, 2, 3))

    // S3: corpus size
    val n = Corpus.fileCount(spark, docsDir)
    assert(n == 3)

    // S5: stopword side input
    val stops = Corpus.readStopwords(spark, stopPath)
    assert(stops == Seq("the"))

    // Job 1: normalize -> presence matrix (golden from FIXTURES.md)
    val matrix = InvertedIndex.termDocMatrix(
      Normalize.tokens(docs, stopwords = stops), n, firstId = 1L)
    val m = matrix.as[(String, Seq[Int])].collect().toMap
    assert(m == Map(
      "cat" -> Seq(1, 1, 0), "meet" -> Seq(1, 0, 1), "agre" -> Seq(1, 0, 1),
      "poni" -> Seq(0, 1, 0), "ti" -> Seq(0, 1, 0), "mat" -> Seq(0, 0, 1)))

    // S6/K1: centers file with bracket-vector parse (trailing comma)
    val centers = Corpus.readCenters(spark, centersPath)
    val c = centers.as[(Int, Seq[Double])].collect().toMap
    assert(c == Map(0 -> Seq(1.0, 1.0, 0.0), 1 -> Seq(0.0, 0.0, 1.0)))

    // Job 2: cosine argmin assignment + cluster aggregation (golden)
    val assigned = KMeansAssign.assign(
      matrix.select(col("term").as("id"), col("vec").cast("array<double>").as("vec")),
      centers)
    val byTerm = assigned.select("id", "center_id").as[(String, Int)].collect().toMap
    assert(byTerm == Map(
      "cat" -> 0, "poni" -> 0, "ti" -> 0,
      "meet" -> 1, "agre" -> 1, "mat" -> 1))

    val clusters = KMeansAssign.clusters(assigned)
      .select("cluster_id", "members").as[(Int, Seq[String])].collect().toMap
    assert(clusters == Map(
      1 -> Seq("cat", "poni", "ti"),
      2 -> Seq("agre", "mat", "meet")))
  }

  test("a file spanning many splits reconstructs byte-identically") {
    // Guard against line-scan reassembly: with a per-line ingest and no
    // in-file sort key, a file larger than maxPartitionBytes could
    // interleave lines from different splits. Whole-file ingest must
    // return the exact bytes no matter how small the split size is.
    val dir = Files.createTempDirectory("graft-split")
    val content = (0 until 20000)
      .map(i => f"line$i%08d ${"x" * 80}").mkString("", "\n", "\n")
    Files.writeString(dir.resolve("7.txt"), content) // ~1.8 MB
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, (64 * 1024).toString) // would be ~30 line-scan splits
    try {
      val docs = Corpus.readDocs(spark, dir.toString).collect()
      assert(docs.length == 1)
      assert(docs(0).getInt(0) == 7)
      assert(docs(0).getString(1) == content, "reconstructed text differs from file bytes")
    } finally prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
  }

  test("reference-format TSV sink round-trips through the job-2 scan") {
    val (docsDir, stopPath, _) = writeCorpus()
    val out = Files.createTempDirectory("graft-sink").resolve("job1").toString
    val docs = Corpus.readDocs(spark, docsDir)
    val matrix = InvertedIndex.termDocMatrix(
      Normalize.tokens(docs, stopwords = Corpus.readStopwords(spark, stopPath)),
      3, firstId = 1L)
    Sinks.writeTsv(InvertedIndex.referenceFormat(matrix), out)

    // re-scan the way job 2 does: term \t [b1,...,bN,]
    val back = spark.read.option("sep", "\t").csv(out)
      .select(col("_c0").as("term"),
        Corpus.parseBracketVector(col("_c1")).as("vec"))
    val m = back.as[(String, Seq[Double])].collect().toMap
    assert(m("cat") == Seq(1.0, 1.0, 0.0))
    assert(m.size == 6)
  }
}
