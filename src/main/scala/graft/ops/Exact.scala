package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact money arithmetic shared by every oracle query suite: through
  * DECIMAL, never float sums. Products are computed decimal x decimal
  * (not double->decimal of the product) because engines disagree on
  * how a double product rounds into a decimal; decimal multiplication
  * is exact in both. DECIMAL(12,2) x DECIMAL(4,2) keeps every
  * intermediate inside both engines' 38-digit width. ONE definition
  * point: the cross-engine hash contract depends on every suite using
  * the identical decimal route.
  */
object Exact {
  def dec(c: Column): Column = c.cast("decimal(18,2)")
  def dec2(c: Column): Column = c.cast("decimal(12,2)")
  def frac(c: Column): Column = c.cast("decimal(4,2)")
  def money(c: Column): Column = sum(dec(c)).cast("double")
}
