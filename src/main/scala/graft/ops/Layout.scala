package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) interleaving for
  * multi-dimensional clustering of written files. Sorting a table by
  * the interleaved key before writing makes every file cover a small
  * rectangle of the (x, y) key space instead of a stripe, so range
  * predicates on EITHER dimension prune files/row-groups by their
  * parquet min/max stats — the standard layout trick for fact tables
  * queried on more than one column.
  *
  * The z-value is a closed-form integer expression (shift/mask/add),
  * fully codegen'd and reproducible in any engine — the q96 oracle
  * recomputes it in DuckDB with the same formula.
  */
object Layout {

  def all: Seq[QueryDef] = Seq(q96)

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions) into a single Morton code. Inputs are masked to
    * `bits` bits first, so out-of-range values wrap rather than
    * corrupt high bits.
    */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zValue2 bits must be in [1,31], got $bits")
    val xi = x.cast("bigint").bitwiseAND(lit((1L << bits) - 1))
    val yi = y.cast("bigint").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(xi, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(yi, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** The same formula as DuckDB SQL text (>> & << and +). */
  private def zSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Write `df` Z-ordered on two integer dimensions: range-partition by
    * the z-value (so files tile the space-filling curve), sort within
    * partitions, drop the helper column at the sink. `numFiles` bounds
    * output file count — at scale, size it to the target file size
    * (the same knob as Sinks.compact).
    */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, bits: Int,
                    numFiles: Int, path: String): Unit = {
    require(!df.columns.contains("__z"),
      "'__z' is reserved by writeZOrdered; rename the input column")
    df.withColumn("__z", zValue2(x, y, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Z-order key computation (q96): Morton codes over the two join
    * dimensions of the fact table, top 200 by code — the key the
    * layout sort uses, hash-checked against DuckDB's recomputation of
    * the identical shift/mask formula. Narrow + top-k (WindowGroupLimit
    * pushes the limit map-side; no full sort materializes).
    */
  val q96: QueryDef = QueryDef.sql(
    "q96_zorder_key",
    s"""SELECT l_orderkey, l_linenumber,
       |  CAST(l_partkey % 256 AS BIGINT) AS x,
       |  CAST(l_suppkey % 256 AS BIGINT) AS y,
       |  CAST(${zSql("(l_partkey % 256)", "(l_suppkey % 256)", 8)} AS BIGINT) AS z
       |FROM lineitem
       |ORDER BY z, l_orderkey, l_linenumber
       |LIMIT 200""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_partkey") % 256).cast("bigint").as("x"),
        (col("l_suppkey") % 256).cast("bigint").as("y"),
        zValue2(col("l_partkey") % 256, col("l_suppkey") % 256, 8).as("z"))
      .orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))
      .limit(200)
  }
}
