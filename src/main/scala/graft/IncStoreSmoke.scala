package graft

import graft.operators.DupClusterStore
import org.apache.spark.sql.functions._

/** At-scale smoke for the INCREMENTAL dup-cluster store: build the
  * store on all-but-the-last-1%-of-ids of a (clone) corpus, absorb the
  * final 1% as a maintenance batch, and dump the resulting assignment
  * as `q_dup_clusters` so `tools/graph_oracle_atscale.py` value+hash
  * compares it against the clone-aware DuckDB derivation — proving the
  * incrementally-maintained store equals the full clustering AT SCALE,
  * not just on the spec fixtures. Prints one JSON line with the three
  * timings that matter: store build, the marginal batch, and (for the
  * denominator) a from-scratch rebuild on the full corpus.
  *
  * Usage: runMain graft.IncStoreSmoke [corpusDir] [workDir]
  */
object IncStoreSmoke {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft_scale_nx")
    val out = if (args.length > 1) args(1) else "/tmp/graft_incstore"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.LocalFs.deleteTree(java.nio.file.Paths.get(out))
    val docs = Tables(spark, src, "documents")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val cut = maxId - (maxId + 1) / 100
    val older = docs.filter(col("doc_id") <= cut)
    val batch = docs.filter(col("doc_id") > cut)
    val (nOld, nBatch) = (older.count(), batch.count())
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // bytes under a path — the r20 commit-unit evidence: maintain must
    // WRITE O(batch), not O(store) (the r19 whole-root swap re-wrote
    // membership/postings per batch)
    def du(p: String): Long = {
      val f = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(f)) 0L
      else {
        val st = java.nio.file.Files.walk(f)
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(java.nio.file.Files.size).sum
        } finally st.close()
      }
    }
    val store = s"$out/store"
    val (_, tBuild) = timed(
      DupClusterStore.buildIncremental(spark, older, store))
    val storeBytes = du(store)
    val (_, tMaintain) = timed(
      DupClusterStore.maintainIncremental(spark, batch, store, batchId = 0L))
    // bytes the maintain COMMITTED: the three batch=0 appends + the
    // swapped assign table (the visibility event)
    val maintainBytes = du(s"$store/membership/batch=0") +
      du(s"$store/postings/batch=0") + du(s"$store/sizes/batch=0") +
      du(s"$store/assign")
    // the dump the at-scale oracle reads (same name + schema as the
    // registered query's Verify output)
    DupClusterStore.assignmentsIncremental(spark, store)
      .orderBy("doc_id")
      .write.mode("overwrite").parquet(s"$out/q_dup_clusters")
    val (_, tFull) = timed(
      DupClusterStore.buildIncremental(spark, docs, s"$out/full"))
    // retraction phase: remove the batch just absorbed — the store must
    // return to exactly the old-corpus clustering, gated by running the
    // at-scale oracle against a SURVIVOR corpus dir written here
    val (_, tRetract) = timed(
      DupClusterStore.retractIncremental(spark,
        batch.select("doc_id"), store, batchId = 1L))
    older.write.mode("overwrite").parquet(s"$out/retract/documents.parquet")
    DupClusterStore.assignmentsIncremental(spark, store)
      .orderBy("doc_id")
      .write.mode("overwrite").parquet(s"$out/retract/q_dup_clusters")
    def fmt(d: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    println(s"""{"metric":"inc_store","src":"$src","n_old":$nOld,""" +
      s""""n_batch":$nBatch,"build_sec":${fmt(tBuild)},""" +
      s""""maintain_sec":${fmt(tMaintain)},""" +
      s""""retract_sec":${fmt(tRetract)},""" +
      s""""full_rebuild_sec":${fmt(tFull)},""" +
      s""""store_bytes":$storeBytes,"maintain_bytes_written":$maintainBytes}""")
    spark.stop()
  }
}
