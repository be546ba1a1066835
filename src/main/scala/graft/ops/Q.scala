package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (where
  * ANSI-expressible) an equivalent DuckDB oracle SQL over the same tables.
  * Names are stable keys — the driver's correctness gate runs both sides and
  * hash-compares. Queries without an oracle get a rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Whether `fn` runs Spark JOBS during construction (iterative
      * algorithms whose round count is data-dependent cannot be a single
      * lazy plan). Almost every query must stay lazy — analysis-only
      * callers (schema sweeps) invoke `fn` for every registered query.
      * Eager queries are exempted from those sweeps and must (a) release
      * every cache they pin before returning (checkpoint the final
      * result, unpersist the intermediates) and (b) carry a ScalaTest
      * that executes them and pins the output schema. */
    eager: Boolean = false)

/** SQL-expressed queries need a catalog name for their input; a FIXED view
  * name collides when two suites (or two sf dirs) share one session. This
  * registers the input under a per-invocation unique name and drops it
  * once the plan is built — `spark.sql` resolves the view during eager
  * analysis, so the returned Dataset no longer needs the catalog entry. */
object Sql {
  private val ctr = new java.util.concurrent.atomic.AtomicLong()
  def withView(s: SparkSession, df: DataFrame, prefix: String)
      (body: String => DataFrame): DataFrame = {
    val name = s"${prefix}_${ctr.incrementAndGet()}"
    df.createOrReplaceTempView(name)
    try body(name) finally s.catalog.dropTempView(name)
  }
}

trait QueryModule {
  def all: Seq[Q]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap
  final def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
