package graft.functions

import graft.SparkSpec
import graft.functions.{functions => gf}

/** The SQL surface: graft's custom expressions callable from spark.sql
  * after registration (functions.register / GraftExtensions).
  */
class SqlInterfaceSpec extends SparkSpec {
  import spark.implicits._

  test("porter_stem / cosine / simhash64 callable from SQL") {
    gf.register(spark)
    Seq(("meetings", Seq(1.0, 0.0), Seq(0.0, 2.0)))
      .toDF("w", "a", "b").createOrReplaceTempView("t")
    val r = spark.sql(
      """SELECT porter_stem(w) AS stem,
        |  cosine_similarity(a, b) AS cs,
        |  cosine_distance(a, a) AS cd,
        |  simhash64(array(1L, 2L, 3L)) AS sh
        |FROM t""".stripMargin).head()
    assert(r.getString(0) == "meet")
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 0.0)
  }

  test("minhash kernels callable from SQL with literal size args") {
    gf.register(spark)
    val r = spark.sql(
      """SELECT minhash_sig(array('a b c', 'b c d'), 8) AS mh,
        |  shingle_minhash('the quick brown fox jumps', 8, 3) AS smh""".stripMargin)
      .head()
    assert(r.getSeq[Long](0).length == 8)
    assert(r.getSeq[Long](1).length == 8)
    // the fused kernel agrees with explicit shingling + minhash_sig
    val both = spark.sql(
      """SELECT shingle_minhash('a b c d', 4, 2) AS fused,
        |  minhash_sig(array('a b', 'b c', 'c d'), 4) AS staged""".stripMargin)
      .head()
    assert(both.getSeq[Long](0) == both.getSeq[Long](1))
  }

  test("nearest_center / sign_bucket callable from SQL with literal array-of-arrays") {
    gf.register(spark)
    // un-suffixed literals (SQL's DECIMAL default) must work: vector
    // args are cast to array<double> at registration
    val r = spark.sql(
      """SELECT
        |  nearest_center(array(0.9, 0.1),
        |    array(array(1.0, 0.0), array(0.0, 1.0))).center_id AS nc,
        |  sign_bucket(array(1.0, -2.0),
        |    array(array(1.0, 0.0), array(0.0, 1.0))) AS sb""".stripMargin).head()
    assert(r.getInt(0) == 0, "(0.9,0.1) is nearest the x-axis center")
    // plane 0: dot=1>=0 -> bit0 set; plane 1: dot=-2<0 -> bit1 clear
    assert(r.getInt(1) == 1)
    // DECIMAL literals (SQL default for 1.0) are converted, and a
    // non-literal centers argument fails loudly
    val err = intercept[Exception] {
      spark.sql("SELECT nearest_center(array(1.0D), array(array(rand())))").head()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("registration is idempotent") {
    gf.register(spark)
    gf.register(spark)
    assert(spark.sql("SELECT porter_stem('ponies')").head().getString(0) == "poni")
  }

  test("end-to-end SQL query over a registered parquet table") {
    gf.register(spark)
    graft.ops.Tables.documents(spark, sfDir).createOrReplaceTempView("documents_v")
    val top = spark.sql(
      """SELECT porter_stem(tok) AS term, count(*) AS n
        |FROM (SELECT explode(split(text, '\\s+')) AS tok FROM documents_v)
        |WHERE length(tok) > 0
        |GROUP BY term ORDER BY n DESC, term LIMIT 5""".stripMargin)
      .collect()
    assert(top.length == 5)
    assert(top.forall(_.getLong(1) > 0))
  }

  test("null array elements are sentinel-hashed, never NPE, across the SQL kernels") {
    gf.register(spark)
    // minhash_sig: null element must not NPE and null == null collides
    val mh = spark.sql(
      """SELECT minhash_sig(array('a', CAST(NULL AS STRING)), 4) AS h1,
        |       minhash_sig(array('a', CAST(NULL AS STRING)), 4) AS h2,
        |       minhash_sig(array('a'), 4) AS h3""".stripMargin).head()
    assert(mh.getSeq[Long](0) == mh.getSeq[Long](1))
    assert(mh.getSeq[Long](0) != mh.getSeq[Long](2),
      "null element must contribute a sentinel hash, not vanish")
    // simhash64: null must mix a sentinel, NOT silently unbox to 0L
    val sh = spark.sql(
      """SELECT simhash64(array(CAST(NULL AS BIGINT))) AS a,
        |       simhash64(array(0L)) AS b""".stripMargin).head()
    assert(sh.getLong(0) != sh.getLong(1),
      "null term-id must not be conflated with term-id 0")
    // bpe_merge_pair (Column API): null element copies through, no
    // NPE, and the output type admits it
    val mp = Seq(Tuple1(Seq("a", null, "a", "b"))).toDF("s")
      .select(gf.bpe_merge_pair(org.apache.spark.sql.functions.col("s"),
        "a", "b").as("m"))
      .head().getSeq[String](0)
    assert(mp == Seq("a", null, "ab"))
  }

  test("presence_vector rejects a non-positive width at construction") {
    val e = intercept[IllegalArgumentException] {
      PresenceVectorAgg.presence_vector(
        org.apache.spark.sql.functions.col("x"), 0, 0L)
    }
    assert(e.getMessage.contains("n >= 1"))
  }
}
