package graft.schema

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import SchemaMerge._

/** Distributed schema inference for unknown TSV feeds (reference:
  * generate_snowflake_ddl.py:334-405 — pandas chunked sampling with
  * per-column classification).
  *
  * The reference pulls a 1M-row sample into pandas on the driver; that
  * collapses at 100 TB. This version computes every per-column statistic
  * (parse-failure counts per candidate type, max length, null counts) in
  * ONE distributed aggregation pass over the sample — no row ever reaches
  * the driver. Classification order matches the reference exactly:
  * date/timestamp (format-list order), all-null → VARCHAR(default),
  * integer, float, boolean, else VARCHAR(tier(maxLen)).
  */
object SchemaInfer {

  /** (python strptime fmt from config/ddl_config.json:7-10, Spark fmt,
    * isDate). Tried in order; first full-parse wins. */
  val dateFormats: Seq[(String, Boolean)] = Seq(
    ("yyyy-MM-dd", true), ("yyyy/MM/dd", true), ("dd-MM-yyyy", true),
    ("yyyy-MM-dd HH:mm:ss", false), ("yyyy-MM-dd HH:mm:ss.SSSSSS", false))

  /** Infer warehouse column specs from an all-string DataFrame (the raw
    * TSV read). `sampleRows` bounds the scan, mirroring --sample-rows
    * (blockchair_etl_pipeline.sh:194). */
  def infer(raw: DataFrame, sampleRows: Int = 1000000): Schema = {
    val df = raw.limit(sampleRows)
    val cols = df.columns.toSeq

    // One aggregation pass: for every column, every candidate-type failure
    // count + max length. cnt(c) counts rows where `c` is true. All parse
    // probes use try_* forms so ANSI mode (Spark 4 default) returns null
    // on failure instead of raising.
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    val aggs = cols.flatMap { name =>
      val c = col(name)
      val q = s"`${name.replace("`", "``")}`"
      val nn = c.isNotNull
      Seq(
        cnt(nn).as(s"${name}__nn"),
        cnt(nn && expr(s"try_cast($q AS BIGINT)").isNull)
          .as(s"${name}__notlong"),
        cnt(nn && expr(s"try_cast($q AS DOUBLE)").isNull)
          .as(s"${name}__notdbl"),
        cnt(nn && !c.isin("True", "False")).as(s"${name}__notbool"),
        max(length(c)).as(s"${name}__maxlen")) ++
        dateFormats.zipWithIndex.map { case ((fmt, _), i) =>
          // strict parse: trailing characters fail, so a date-only format
          // rejects timestamps (mirrors the pandas errors='raise' probe);
          // DATE vs TIMESTAMP classification comes from the format flag.
          cnt(nn && expr(s"try_to_timestamp($q, '$fmt')").isNull)
            .as(s"${name}__fmt$i")
        }
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def l(field: String): Long = {
      val v = row.getAs[Any](field)
      if (v == null) 0L else v.asInstanceOf[Number].longValue()
    }

    cols.zipWithIndex.map { case (name, idx) =>
      val nonNull = l(s"${name}__nn")
      val matchedFmt = dateFormats.indices.find(i =>
        nonNull > 0 && l(s"${name}__fmt$i") == 0L)
      val typ: SfType = matchedFmt match {
        case Some(i) => if (dateFormats(i)._2) SfDate else SfTimestamp
        case None if nonNull == 0 => SfVarchar(defaultStringLength)
        case None if l(s"${name}__notlong") == 0 => SfInteger
        case None if l(s"${name}__notdbl") == 0 => SfFloat
        case None if l(s"${name}__notbool") == 0 => SfBoolean
        case None =>
          val maxLen = row.getAs[Any](s"${name}__maxlen") match {
            case null => None
            case v => Some(v.asInstanceOf[Number].intValue())
          }
          SfVarchar(varcharTier(maxLen))
      }
      ColumnSpec(sanitize(name, idx), typ)
    }
  }
}
