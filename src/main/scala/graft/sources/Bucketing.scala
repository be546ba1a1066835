package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout management — the "cluster_by" story at 100 TB
  * (SURVEY.md §4: clustering keys per model; reference
  * int_transaction_flows.sql cluster_by=['transaction_hash','tx_time']).
  *
  * Writing both sides of a recurring join bucketed by the join key (same
  * bucket count) lets Spark plan a sort-merge join with ZERO exchanges —
  * the shuffle is paid once at write time and amortized over every
  * subsequent join/aggregation on that key. This is the physical design
  * that makes the flow-edge generator (tx ⋈ inputs ⋈ outputs on
  * transaction_hash) and the per-address window pipelines exchange-free
  * at scale.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted table — managed by default, or an
    * external table at `path`. The single shared implementation of the
    * bucketed-layout contract: the input is pre-repartitioned into
    * exactly `buckets` bucket-hash partitions so each bucket lands as
    * ONE file (the layout Spark trusts for bucket-sorted reads; a
    * multi-file bucket forfeits the sort metadata), and when `path` is
    * given any stale catalog entry is dropped first so reruns are
    * idempotent. `Pipeline.writeBuild(buckets = Some(n))` and
    * `BucketBench` both write through here. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int, sortCols: Seq[String] = Nil,
      path: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.col
    val ss = df.sparkSession
    if (path.isDefined) ss.sql(s"DROP TABLE IF EXISTS $table")
    else if (!ss.catalog.tableExists(table)) {
      // Managed-table rerun across sessions: with a non-persistent
      // catalog a dead session's files still occupy the default
      // location while the table entry is gone — saveAsTable then
      // refuses with LOCATION_ALREADY_EXISTS instead of overwriting.
      // Clear the stale location first (default-db managed layout:
      // <warehouse>/<table lowercased>).
      val loc = new org.apache.hadoop.fs.Path(
        ss.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(ss.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val w = df.repartition(buckets, bucketCols.map(col): _*)
      .write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
      else w
    val located = path.fold(sorted)(p => sorted.option("path", p))
    located.format("parquet").saveAsTable(table)
  }

  /** Co-located equi-join over two tables bucketed on the join key:
    * with matching bucket counts Spark plans SMJ with no Exchange on
    * either side. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      on: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), on, joinType)
}
