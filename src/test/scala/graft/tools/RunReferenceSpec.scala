package graft.tools

import graft.SparkSpec

/** Golden end-to-end test of the reference-CLI pipeline: a 3-doc corpus
  * whose index and clusters are verifiable by hand (stems: cats->cat,
  * running/runs->run, dogs->dog; stopwords drop; ties break to the
  * lower center id).
  */
class RunReferenceSpec extends SparkSpec {

  private def write(path: java.nio.file.Path, s: String): Unit =
    java.nio.file.Files.write(path, s.getBytes("UTF-8"))

  test("CLI pipeline reproduces hand-computed index and clusters") {
    val in = java.nio.file.Files.createTempDirectory("refcorpus")
    write(in.resolve("1.txt"), "the cats are running\n")
    write(in.resolve("2.txt"), "a dog ran fast\n")
    write(in.resolve("3.txt"), "cats and dogs running\n")
    write(in.resolve("stopwords.txt"), "the a and are\n")
    write(in.resolve("centers.txt"), "[1,0,0,]\n[0,0,1,]\n")
    // a NOT-yet-existing path: the CLI refuses to write into an
    // existing output dir (mode=error, matching Hadoop MR)
    val out = java.nio.file.Files.createTempDirectory("refout")
      .resolve("out").toString

    RunReference.run(spark, in.toString, out,
      in.resolve("stopwords.txt").toString, in.resolve("centers.txt").toString)

    def lines(sub: String): Seq[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(out, sub)).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-"))
        .flatMap(p => java.nio.file.Files.readAllLines(p).asScala)
        .toSeq.sorted
    }

    // NB: stopwords.txt/centers.txt live in the corpus dir but have no
    // numeric filename, so the source skips them (guarded id parse).
    // Job 1 output sits at the output-dir ROOT — the reference's layout.
    assert(lines("") == Seq(
      "cat\t[1,0,1,]",
      "dog\t[0,1,1,]",
      "fast\t[0,1,0,]",
      "ran\t[0,1,0,]",
      "run\t[1,0,1,]"))
    // centers: c0=[1,0,0], c1=[0,0,1].
    //   cat/run [1,0,1]: equidistant -> tie -> c0; fast/ran [0,1,0]:
    //   orthogonal to both -> tie -> c0; dog [0,1,1]: nearer c1.
    assert(lines("kmeansOutput6") == Seq("1\tcat fast ran run", "2\tdog"))
  }
}
