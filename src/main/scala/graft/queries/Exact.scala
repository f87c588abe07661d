package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Helpers that make floating aggregates *bitwise* reproducible between
  * Spark and the DuckDB oracle.
  *
  * Summing doubles is order-dependent, and Spark's partial aggregation
  * visits rows in a different order than DuckDB's sequential scan — a raw
  * `sum(double)` can differ in the last few ulps, which breaks the driver's
  * hash compare even after rounding (a value can sit on a rounding
  * boundary). The fix: money columns in the corpus carry exactly 2 decimal
  * digits, so we cast to DECIMAL before arithmetic — decimal sums are exact
  * in any order in both engines — and cast the final aggregate back to
  * DOUBLE (the same exact decimal converts to the same double everywhere).
  *
  * The SQL strings are shared verbatim between the Spark plan (via `expr`)
  * and the DuckDB oracle text, so the two engines evaluate structurally
  * identical expressions. Widths are chosen so no intermediate exceeds
  * DECIMAL(38,s) in either engine (no precision-loss rounding kicks in).
  */
object Exact {
  /** price * (1 - discount), exact: DECIMAL(12,2) * DECIMAL(4,2). */
  val discPriceSql: String =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))"

  /** price * (1 - discount) * (1 + tax), exact DECIMAL(22,6). */
  val chargeSql: String =
    s"$discPriceSql * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))"

  /** SUM of an exact-decimal expression, returned as DOUBLE. */
  def sumDouble(inner: String): String = s"CAST(SUM($inner) AS DOUBLE)"

  /** The standard revenue aggregate used across the relational queries. */
  val revenueSql: String = sumDouble(discPriceSql)

  /** Exact decimal sum of a 2-decimal money column, as DOUBLE. */
  def sumMoney(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE)"

  /** Mean computed as exact-decimal sum over count — both engines perform
    * the same single double division at the end.
    */
  def avgMoney(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)"

  def col(sql: String): Column = expr(sql)
}
