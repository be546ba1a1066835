package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric discipline for DuckDB-oracle hash parity.
  *
  * Double-precision SUM/AVG results depend on accumulation order, which
  * differs between Spark's partial aggregation and DuckDB (and between Spark
  * runs, with AQE). Any aggregate of a non-integral double column that lands
  * in a compared result therefore goes through exact decimal arithmetic:
  * cast the input to DECIMAL(18,6), aggregate (exact in both engines), cast
  * the result to a fixed output type. Counts stay BIGINT; doubles that are
  * exactly representable (integral quantities) may stay double.
  */
object Parity {
  /** Exact money/measure arithmetic: decimal input for aggregation. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Canonical output type for decimal aggregates. The *aggregation* stays
    * exact in decimal; the final compared column is cast to DOUBLE because
    * the driver's hasher canonicalizes DECIMAL outputs differently between
    * Spark parquet and DuckDB (r1: 8 value-identical queries hash-failed on
    * DECIMAL(38,6) outputs alone). Below 2^53 of unscaled value the cast
    * is exact; beyond it, bit-identity relies on both engines rounding the
    * decimal→double conversion correctly (IEEE nearest-even), which the
    * sf0.1 gate pins in practice: sum(l_extendedprice) there carries
    * ~2.3e16 unscaled — past 2^53 — and still hash-matches. */
  def outDec(c: Column): Column = c.cast("double")

  /** Exact sum of a money-like double column. */
  def decSum(c: Column): Column = outDec(sum(dec(c)))

  // NOTE deliberately no decAvg: engines disagree on AVG(DECIMAL) result
  // types (DuckDB returns DOUBLE, Spark a widened decimal), so decimal
  // averages cannot hash-match. Express averages as sum+count, or round
  // a double average for single-row outputs (see a4_avg_nullguard).

  /** SQL fragments for the DuckDB side of the same discipline. */
  def sqlDecSum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlOutDec(expr: String): String =
    s"CAST($expr AS DOUBLE)"
}
