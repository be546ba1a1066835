package graft

import org.apache.spark.sql.DataFrame
import graft.ops.{CorpusOps, TextOps}

/** Above-gate A/B for the jaccard corpus layouts (VERDICT r12 item 4):
  * cache arm (`jaccardPairsWithRelease` — the shingled corpus pinned in
  * executor memory) vs bucketed arm (`jaccardPairsBucketed` — the
  * corpus persisted as a doc_id-bucketed table), run against a corpus
  * PAST `TextOps.CORPUS_CACHE_MAX_BYTES` (generate one with
  * `DataGen docs <nDocs> <outDir>`; ~25M docs ≈ 2.8 GiB parquet). The
  * gate constant was picked by design argument at r12 — this bench is
  * the measurement that confirms or re-tunes it.
  *
  * One arm per invocation (solo protocol: cold JVM, 3 runs, min kept):
  *   gate           — print the corpus's gate decision (which arm Auto picks)
  *   pairs-cache | pairs-bkt      — ngram_jaccard_pairs over each layout
  *   pairs-gated                  — the registered lazy query, gate deciding
  *                                  (above the gate: the r14 uncached plan)
  *   pairs-auto                   — the routed gate entry itself: run1 pays
  *                                  the memoized write, runs 2-3 amortize
  *   pairs-bkt-reuse              — bucketed table written once, then the
  *                                  query timed alone (the amortized regime
  *                                  a standing corpus table serves)
  *   clusters-cache | clusters-bkt — dup_clusters over each layout
  * Env: SPARK_GRAFT_SF_DIR (the corpus dir), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SHUFFLE.
  *
  * Both arms run the registry's OWN expressions — the pairs plan via
  * the shared `jaccardPairsFrom` body, clusters via
  * `CorpusOps.dupClustersFrom` with the arm's provider injected. */
object JaccardBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = Sessions.builder(cpus, shuffle).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // each run gets its own provider so per-run state (cache blocks,
    // table rewrite) is paid inside the timed window — a cold-layout
    // comparison on both arms
    def runPairs(name: String,
        mk: () => (DataFrame, () => Unit)): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val (pairs, release) = mk()
        val n = pairs.count()
        println(f"JACCARDBENCH $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
        release()
        spark.catalog.clearCache()
        System.gc()
      }

    def runClusters(name: String,
        mk: () => (DataFrame, () => Unit)): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = CorpusOps.dupClustersFrom(mk()).count()
        println(f"JACCARDBENCH $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
        spark.catalog.clearCache()
        System.gc()
      }

    // the cache arm FORCES the cache — since r14 jaccardPairsWithRelease
    // is itself size-gated, and an A/B of the layouts must run the
    // cached plan even on corpora the gate (correctly) refuses
    val cacheArm = () =>
      TextOps.jaccardPairsWithRelease(spark, d, cached = Some(true))
    val bktArm = () => (TextOps.jaccardPairsBucketed(spark, d), () => ())

    args.headOption.getOrElse("") match {
      case "gate" =>
        val cacheable = TextOps.corpusCacheable(spark, d)
        val bcast = TextOps.corpusBcastable(spark, d)
        println(s"JACCARDBENCH gate corpusCacheable=$cacheable -> Auto " +
          s"picks ${if (cacheable) "cache" else "bucketed"} " +
          s"(bound=${TextOps.CORPUS_CACHE_MAX_BYTES} bytes); " +
          s"corpusBcastable=$bcast " +
          s"(bound=${TextOps.CORPUS_BCAST_MAX_BYTES} bytes)")
      case "pairs-cache" => runPairs("pairs-cache", cacheArm)
      case "pairs-bkt" => runPairs("pairs-bkt", bktArm)
      case "pairs-gated" =>
        // the REGISTERED lazy query exactly as the registry runs it:
        // jaccardPairsWithRelease with the gate deciding — above the
        // gate this is the r14 uncached lazy plan, the arm that replaces
        // the unconditional cache the r13 sweep measured DNF-ENOSPC
        runPairs("pairs-gated", () =>
          TextOps.jaccardPairsWithRelease(spark, d))
      case "pairs-auto" =>
        // the ROUTED path end-to-end (r14): run1 pays the memoized
        // corpus-table write inside jaccardPairsAuto, runs 2-3 hit the
        // (session, dataset) memo and read the standing table — the
        // amortized regime the reuse arm measured, now reproduced
        // through the gate entry the registry queries actually call
        runPairs("pairs-auto", () => TextOps.jaccardPairsAuto(spark, d))
      case "pairs-bkt-reuse" =>
        // pay the write once (timed separately), then time the query
        // alone over the standing table
        val t0 = System.nanoTime()
        TextOps.jaccardPairsBucketed(spark, d)
        println(f"JACCARDBENCH pairs-bkt-reuse write=${(System.nanoTime() - t0) / 1e9}%.2f s")
        val t = TextOps.bucketedTableName(d)
        runPairs("pairs-bkt-reuse", () =>
          (TextOps.jaccardPairsOverTable(spark, d, t), () => ()))
      case "clusters-cache" => runClusters("clusters-cache", cacheArm)
      case "clusters-bkt" => runClusters("clusters-bkt", bktArm)
      case other =>
        sys.error(s"unknown arm '$other' — expected gate | pairs-cache |" +
          " pairs-bkt | pairs-gated | pairs-auto | pairs-bkt-reuse |" +
          " clusters-cache | clusters-bkt")
    }
    spark.stop()
  }
}
