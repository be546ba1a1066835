package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-concern modules; each module entry is an
  * operator from the SURVEY.md §2 inventory (or a north-star extension)
  * with a DuckDB oracle where ANSI-expressible.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] =
    Seq(Relational, TraceOps, DomainModels, TextOps, VectorOps, MediaOps,
      ScaleOps, BloomOps, Extensions, PortableHashOps, ClassicQueries,
      ClassicQueries2, RecallOps, CorpusOps, GraphOps,
      graft.streaming.StreamQueries, graft.models.PipelineQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The recursive multi-hop trace is the reference's flagship
    * (transaction_tracing/README.md:22-57). */
  def entry(spark: SparkSession): DataFrame =
    TraceOps.queries("j5_trace_recursive")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. A name
    * collision across modules would silently last-win and drop a query
    * from the correctness gate — fail loudly instead. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val names = modules.flatMap(_.all.map(_.name))
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    modules.flatMap(_.queries).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
