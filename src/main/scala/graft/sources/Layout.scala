package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustered layout (Z-order) — the data-layout lever
  * for predicates that Bucketing's single-key story cannot serve.
  *
  * A sort on one column gives perfect file-level min/max pruning on that
  * column and none on any other. Interleaving the bits of several
  * columns (the Morton/Z-curve) and range-partitioning + sorting on the
  * interleaved value gives every participating column PARTIAL locality:
  * a range predicate on ANY of the dimensions overlaps only
  * O(files^(1-1/k)) of the k-dim layout's file boxes, so the parquet
  * footer min/max stats prune the rest at planning time. At 100 TB this
  * is the difference between "point lookup on (address, day) scans one
  * row group" and "scans the whole table because day was the sort key
  * and address wasn't".
  *
  * Everything here is a single lazy plan: per-column bounds come from a
  * one-row aggregate broadcast back over the data (no driver collect),
  * the bit-spread is built from codegen'd integer ops (shiftleft /
  * bitwiseAND — no UDF), and the physical layout is
  * repartitionByRange(z) + sortWithinPartitions(z), i.e. exactly one
  * exchange paid at write time.
  */
object Layout {

  /** Spread the low 16 bits of `c` to the even bit positions of a
    * 32-bit value (classic Morton magic-number shifts; all codegen'd
    * built-ins). */
  private def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** Scale a numeric column into [0, 65535] given its one-row bounds
    * (columns `__min_<name>` / `__max_<name>`). Constant columns map to
    * bucket 0. */
  private def bucket16(name: String): Column = {
    val x = col(name).cast("double")
    val lo = col(s"__min_$name").cast("double")
    val hi = col(s"__max_$name").cast("double")
    val span = hi - lo
    val scaled = when(span <= 0, lit(0L)).otherwise(
      least(floor((x - lo) / span * 65536), lit(65535L)).cast("long"))
    greatest(scaled, lit(0L))
  }

  /** Z-value of two dimensions (the common case; each contributes 16
    * bits of a 32-bit key). */
  def zValue2(c1: String, c2: String): Column =
    spread16(bucket16(c1)).bitwiseOR(shiftleft(spread16(bucket16(c2)), 1))

  /** Attach the z-value for `dims` (currently 2 dims) to `df` — bounds
    * are computed as a one-row aggregate and broadcast, so the result
    * stays one lazy plan. */
  def withZValue(df: DataFrame, dims: Seq[String],
      zCol: String = "__z"): DataFrame = {
    require(dims.size == 2, "zValue supports exactly 2 dimensions")
    val bounds = df.agg(
      min(col(dims.head)).as(s"__min_${dims.head}"),
      max(col(dims.head)).as(s"__max_${dims.head}"),
      min(col(dims(1))).as(s"__min_${dims(1)}"),
      max(col(dims(1))).as(s"__max_${dims(1)}"))
    df.crossJoin(broadcast(bounds))
      .withColumn(zCol, zValue2(dims.head, dims(1)))
      .drop(s"__min_${dims.head}", s"__max_${dims.head}",
        s"__min_${dims(1)}", s"__max_${dims(1)}")
  }

  /** Write `df` Z-ordered on `dims` into `numFiles` range-partitioned,
    * internally sorted parquet files. One exchange total. */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[String],
      numFiles: Int): Unit =
    withZValue(df, dims)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Per-file [min,max] boxes for `dims` — the information the parquet
    * footer gives the scan planner. Used to VERIFY pruning quality: a
    * query box prunes every file whose box does not overlap it. */
  def fileBoxes(spark: org.apache.spark.sql.SparkSession, path: String,
      dims: Seq[String]): DataFrame = {
    val aggs = dims.flatMap(d =>
      Seq(min(col(d)).as(s"min_$d"), max(col(d)).as(s"max_$d")))
    spark.read.parquet(path)
      .withColumn("__file", input_file_name())
      .groupBy("__file")
      .agg(aggs.head, aggs.tail: _*)
  }
}
