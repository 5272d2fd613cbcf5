package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Malformed-input behavior: parsers must degrade row-local (null /
  * skip), never fail the job — at 100 TB there is ALWAYS a corrupt
  * record, and one bad row must not kill a million-task scan.
  */
class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  test("bracket-vector parse: junk degrades to null elements, not a thrown scan") {
    val rows = Seq("[1,2,3,]", "[]", "", "[a,b]", "nonsense", "[1.5,-2]")
      .toDF("v")
      .select(Corpus.parseBracketVector(col("v")).as("parsed"))
      .collect()
    // well-formed rows parse; garbage yields null elements or empty
    assert(rows(0).getSeq[Double](0) == Seq(1.0, 2.0, 3.0))
    assert(rows(1).getSeq[Double](0).isEmpty)
    assert(rows(5).getSeq[Double](0) == Seq(1.5, -2.0))
    assert(rows(3).getSeq[Any](0).forall(_ == null)) // [a,b] -> [null,null]
  }

  test("corpus scan skips non-numeric filenames instead of failing the job") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mixed")
    java.nio.file.Files.write(dir.resolve("1.txt"), "alpha beta".getBytes)
    java.nio.file.Files.write(dir.resolve("README"), "not a doc".getBytes)
    java.nio.file.Files.write(dir.resolve("_checkpoint.tmp"), "x".getBytes)
    // trailing digits must NOT ingest under a bogus id (anchored regex)
    java.nio.file.Files.write(dir.resolve("readme2.txt"), "impostor".getBytes)
    // id beyond Int range must be skipped, not crash the ANSI cast
    java.nio.file.Files.write(dir.resolve("99999999999.txt"), "too big".getBytes)
    val docs = Corpus.readDocs(spark, dir.toString).collect()
    assert(docs.map(_.getInt(0)).toSeq == Seq(1))
    assert(!docs.exists(_.getString(1).contains("impostor")))
  }

  test("from_json on malformed props yields null, and aggregation survives") {
    val rows = Seq("""{"k": 7}""", """{"k": """, "", "plain text", """{"j": 1}""")
      .toDF("props")
      .select(element_at(
        from_json(col("props"), lit("map<string,bigint>")), "k").as("k"))
      .collect()
    assert(rows(0).getLong(0) == 7L)
    assert(rows.drop(1).forall(_.isNullAt(0)))
  }

  test("langId and quality scoring are total on empty/whitespace text") {
    val docs = Seq((1L, "", "en"), (2L, "   ", "en"), (3L, "\n\t", "en"))
      .toDF("doc_id", "text", "lang")
    // must not throw; every doc gets some deterministic label/score
    val lang = graft.ops.TextAnalytics.langId(docs).collect()
    assert(lang.length == 3)
    val stemmed = docs.select(
      graft.functions.functions.porter_stem(col("text"))).collect()
    assert(stemmed.length == 3)
  }
}
