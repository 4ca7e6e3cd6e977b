package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted near-dup cluster assignments — cluster once, read many.
  *
  * The five CC consumers (q_dedup_full, q_cluster_canonical,
  * q_leakage_safe_split, q_bcubed, the TVF dedup mode) each rebuild the
  * same edge frame and connected components from scratch: correct and
  * scale-sound per query, but at 100 TB that is five redundant corpus
  * passes for ONE clustering. The production shape is this fixture: a
  * content-tagged `(doc_id, cluster_id)` assignment table built once
  * per (corpus contents, threshold) — the [[graft.functions.AnnIndex]]
  * / BucketedTables discipline — that every downstream consumer reads
  * as a keyed probe. Clustered docs only (singletons are absent, as in
  * q_dup_clusters): the table is |clustered docs|-sized, tiny next to
  * the corpus, and consumers coalesce missing ids to themselves.
  *
  * Freshness is the same contract as every stored fixture here: the
  * path embeds [[graft.ops.ContentTag]] of the documents table plus the
  * threshold, so a corpus rewrite or a different operating point builds
  * a new assignment table instead of silently serving stale clusters.
  * The _SUCCESS marker gates cross-JVM reuse (Spark writes it last).
  *
  * The registered self-contained queries keep the full
  * pipeline-under-oracle contract; the `_stored` variants registered
  * next to them verify THIS table's bytes — their DuckDB oracles read
  * the stored parquet directly (the AnnIndex stored-bytes discipline)
  * and DupClusterStoreSpec pins stored ≡ recomputed bit-for-bit.
  */
object DupClusterStore {

  /** Most recent ensure()'d assignment root — the side channel the
    * dynamically-built `_stored` oracles read (Verify dumps oracleSql
    * AFTER running the queries, so the path is recorded by then; a
    * filtered run that skips the stored queries also skips their
    * compares, so the fallback SQL never executes).
    */
  @volatile private[graft] var lastEnsuredDir: Option[String] = None

  private val ensured = scala.collection.mutable.Map.empty[String, String]

  /** Idempotently build the assignment table for `sfDir`'s documents at
    * `threshold`, once per (JVM, corpus contents, threshold) — and
    * across JVMs via the parquet `_SUCCESS` marker. Returns the root.
    *
    * Build path is the 100 TB one: connectivity-mode edges (clone-group
    * linear) into min-label connected components — the exact
    * q_dup_clusters semantics, spec-pinned equal to it.
    */
  def ensure(s: SparkSession, sfDir: String, threshold: Double = 0.05): String =
    synchronized {
      val tag = graft.ops.ContentTag.of(sfDir, Seq("documents"))
      val key = f"${tag}_t${math.round(threshold * 1000)}%d"
      val root = ensured.getOrElseUpdate(key, {
        val r = s"${sys.props("java.io.tmpdir")}/graft_dup_clusters/v1_$key"
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$r/_SUCCESS"))) {
          val edges = DedupOps.ngramJaccardConnectivityEdges(
            Tables(s, sfDir, "documents"), "doc_id", "text", threshold)
          GraphOps.dupClusters(edges)
            .select(col("id").as("doc_id"), col("cluster_id"))
            // one file: the table is |clustered docs|-sized (pairs-dense
            // corpora stay far below the corpus row count), and single-
            // file reads keep the DuckDB oracle glob trivial. At real
            // 100 TB scale this coalesce(1) is the one knob to revisit —
            // a partitioned layout bucketed by doc_id hash serves the
            // same keyed probes.
            .coalesce(1)
            .write.mode("overwrite").parquet(r)
        }
        r
      })
      lastEnsuredDir = Some(root)
      root
    }

  /** The stored assignments as a DataFrame — the consumers' read path. */
  def assignments(s: SparkSession, sfDir: String, threshold: Double = 0.05): DataFrame =
    s.read.parquet(ensure(s, sfDir, threshold))
}
