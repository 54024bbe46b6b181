package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum

/** Exact, order-independent aggregation of money-like doubles, shared by
  * every oracle-checked query: sum through DECIMAL (associative and
  * commutative, unlike double addition) and cast the result back to
  * double so Spark and DuckDB schemas line up.
  */
object Exact {

  /** Exact sum of a 2-decimal double column (money). */
  def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact sum of a derived double with up to 6 meaningful decimals. */
  def dsum6(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("double")
}
