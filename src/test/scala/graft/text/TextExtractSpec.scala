package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextExtractSpec extends SparkSpec {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(TextExtract.stripHtml(col("h")))
      .as[String].head()

  test("tags, comments, script and style blocks are removed; prose kept") {
    val html =
      """<html><!-- nav v3 --><head><title>T</title>
        |<style>body { margin: 0 }</style></head>
        |<body><h1>Hello</h1><p class="x">world   again</p>
        |<script>if (a < b && c > d) { alert("x"); }</script>
        |</body></html>""".stripMargin
    assert(strip(html) == "T Hello world again")
  }

  test("entities decode once, amp last (no double-decode)") {
    assert(strip("<p>Q&amp;A &lt;tag&gt; &quot;q&quot;&nbsp;&#39;s</p>")
      == "Q&A <tag> \"q\" 's")
    // &amp;lt; must become the literal text "&lt;", not "<"
    assert(strip("x &amp;lt; y") == "x &lt; y")
  }

  test("multiline script/style bodies drop ((?s) dot-matches-newline)") {
    assert(strip("<script>\nvar a = 1;\nvar b = 2;\n</script>ok") == "ok")
    assert(strip("<STYLE media=\"all\">\n.a{}\n</STYLE>ok") == "ok")
  }

  test("plain text passes through; whitespace runs collapse") {
    assert(strip("no markup at  all\n\t here") == "no markup at all here")
    assert(strip("") == "")
  }
}
