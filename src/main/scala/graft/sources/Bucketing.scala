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
  *
  * SINGLE-WRITER CONTRACT: a bucketed table (and its warehouse
  * location) must have at most one writing session at a time, and a
  * rerun of a dead session's write assumes no OTHER live session is
  * reading the same table name from a shared warehouse — the
  * stale-location recovery below deletes files the current session's
  * catalog does not own, which in a shared warehouse could be another
  * session's live managed table (VERDICT r13 finding 2). Dataset-keyed
  * table names (TextOps.bucketedTableName) confine that to concurrent
  * same-corpus sessions; anything long-lived sharing a warehouse must
  * coordinate writers externally (one writer per table name) before
  * calling [[writeBucketed]].
  */
object Bucketing {

  /** Marker file written into every bucketed table's location recording
    * the ACTUAL bucket count of the layout. Cross-JVM readers that must
    * restate the spec in a `CREATE TABLE ... INTO n BUCKETS` DDL
    * (LayoutBench.ensureTable) read this instead of trusting an env
    * var: Spark trusts the DDL, so a restated count larger than the
    * written one plans exchange-free SMJ/window over WRONG bucket
    * placement — silently wrong rows (ADVICE r13). Underscore-prefixed,
    * so Spark's file index ignores it as a data file. */
  val BucketMarkerFile = "_graft_buckets"

  /** Write `df` as a bucketed, sorted table — managed by default, or an
    * external table at `path`. The single shared implementation of the
    * bucketed-layout contract: the input is pre-repartitioned into
    * exactly `buckets` bucket-hash partitions so each bucket lands as
    * ONE file (the layout Spark trusts for bucket-sorted reads; a
    * multi-file bucket forfeits the sort metadata), and when `path` is
    * given any stale catalog entry is dropped first so reruns are
    * idempotent. `Pipeline.writeBuild(buckets = Some(n))` and
    * `BucketBench` both write through here.
    *
    * `table` may be database-qualified (`db.t`); the stale-location
    * recovery resolves the managed location THROUGH the session catalog
    * (defaultTablePath on the parsed identifier), never by string
    * concatenation — `<warehouse>/<table>` is only the default-db
    * layout, and deleting it while the current database is non-default
    * would destroy a live default-db table's data whose catalog entry
    * still exists (ADVICE r13). The delete still assumes the
    * single-writer contract above. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int, sortCols: Seq[String] = Nil,
      path: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.col
    val ss = df.sparkSession
    val ident = ss.sessionState.sqlParser.parseTableIdentifier(table)
    if (path.isDefined) ss.sql(s"DROP TABLE IF EXISTS $table")
    else if (!ss.sessionState.catalog.tableExists(ident)) {
      // Managed-table rerun across sessions: with a non-persistent
      // catalog a dead session's files still occupy the managed
      // location while the table entry is gone — saveAsTable then
      // refuses with LOCATION_ALREADY_EXISTS instead of overwriting.
      // Clear the stale location first. defaultTablePath resolves the
      // identifier against the CURRENT database exactly like the
      // tableExists check and the saveAsTable below, so the existence
      // check and the delete can never disagree about which table they
      // are talking about.
      val loc = new org.apache.hadoop.fs.Path(
        ss.sessionState.catalog.defaultTablePath(ident))
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
    writeBucketMarker(ss, table, buckets)
  }

  /** Record the written layout's actual bucket count at the table's
    * (catalog-resolved) location. */
  private def writeBucketMarker(ss: SparkSession, table: String,
      buckets: Int): Unit = {
    val ident = ss.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      ss.sessionState.catalog.getTableMetadata(ident).location)
    val fs = loc.getFileSystem(ss.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(loc, BucketMarkerFile),
      /* overwrite = */ true)
    try out.write(s"$buckets\n".getBytes("UTF-8")) finally out.close()
  }

  /** The bucket count a layout at `location` was actually written with,
    * from its [[BucketMarkerFile]] — None if the marker is absent
    * (pre-r14 layout) or unreadable. */
  def readBucketMarker(ss: SparkSession, location: String): Option[Int] =
    try {
      val p = new org.apache.hadoop.fs.Path(location, BucketMarkerFile)
      val fs = p.getFileSystem(ss.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try {
          val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          Some(s.toInt)
        } finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Co-located equi-join over two tables bucketed on the join key:
    * with matching bucket counts Spark plans SMJ with no Exchange on
    * either side. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      on: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), on, joinType)
}
