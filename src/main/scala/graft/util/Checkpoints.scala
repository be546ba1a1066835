package graft.util

import org.apache.spark.sql.DataFrame

/** Tracked eager localCheckpoints. `localCheckpoint(true)` pins RDD
  * blocks that never register with the SQL cacheManager, so convergence
  * loops (and anything else that checkpoints per-iteration) must track
  * the persistent-RDD ids they created and release the stale ones
  * explicitly — waiting for GC + ContextCleaner lets full-size block
  * sets pile up across rounds. Shared by GraphOps' star loops,
  * CorpusOps' pair staging, and the incremental-build sentinel snapshot;
  * the id-diff is taken around a single materialization, so interleaved
  * persists from OTHER threads would be mis-attributed — callers run
  * their loops single-threaded on the driver, which is the only place
  * this pattern is used.
  */
object Checkpoints {

  /** Eagerly checkpoint `df`, returning the checkpointed frame plus the
    * persistent-RDD ids the materialization created (release them with
    * [[release]] once no live plan references the snapshot). */
  def ckptTracked(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    try {
      val out = df.localCheckpoint(true)
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    } catch {
      // localCheckpoint(true) persists the RDD BEFORE running the
      // materialization job, so a mid-job task failure (disk/OOM)
      // leaves partial blocks pinned while the caller never receives
      // ids to release — unpersist the diff here so the failure path
      // leaks nothing.
      case e: Throwable =>
        (sc.getPersistentRDDs.keySet.toSet -- before).foreach(id =>
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
        throw e
    }
  }

  def release(df: DataFrame, ids: Set[Int]): Unit = {
    val sc = df.sparkSession.sparkContext
    ids.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
  }
}
