package graft

import graft.operators.{DedupOps, DupClusterStore, GraphOps}
import org.apache.spark.sql.functions._

/** The cluster-once-read-many fixture: stored assignment bytes must be
  * bit-equal to a fresh clustering, consumers reading the store must
  * match the self-contained registered queries, and the content-tagged
  * path must isolate operating points (threshold) from each other.
  */
class DupClusterStoreSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def fresh = {
    val edges = DedupOps.ngramJaccardConnectivityEdges(
      Tables(spark, sfDir, "documents"), "doc_id", "text", 0.05)
    GraphOps.dupClusters(edges)
      .select(col("id").as("doc_id"), col("cluster_id"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("stored assignments equal a fresh clustering bit-for-bit") {
    val stored = DupClusterStore.assignments(spark, sfDir)
    assert(rows(stored) == rows(fresh))
    // schema is the narrow keyed-probe shape
    assert(stored.schema.fieldNames.toSeq == Seq("doc_id", "cluster_id"))
  }

  test("ensure() is idempotent and threshold-keyed") {
    val a = DupClusterStore.ensure(spark, sfDir)
    val b = DupClusterStore.ensure(spark, sfDir)
    assert(a == b, "same corpus+threshold must reuse the same root")
    val c = DupClusterStore.ensure(spark, sfDir, threshold = 0.5)
    assert(c != a, "a different operating point must get its own table")
    // the tighter threshold's clustering is its own fixture, also exact
    val freshT = {
      val e = DedupOps.ngramJaccardConnectivityEdges(
        Tables(spark, sfDir, "documents"), "doc_id", "text", 0.5)
      GraphOps.dupClusters(e).select(col("id").as("doc_id"), col("cluster_id"))
    }
    assert(rows(spark.read.parquet(c)) == rows(freshT))
  }

  test("stored consumers match the self-contained registered queries") {
    // the production claim in one assertion per consumer: reading the
    // persisted table gives the SAME answer as rebuilding the
    // clustering inside the query
    for ((stored, self) <- Seq(
        "q_dedup_full_stored" -> "q_dedup_full",
        "q_cluster_canonical_stored" -> "q_cluster_canonical",
        "q_leakage_safe_split_stored" -> "q_leakage_safe_split",
        "q_bcubed_stored" -> "q_bcubed")) {
      val a = SparkEntry.queries(stored)(spark, sfDir).collect().toSeq
      val b = SparkEntry.queries(self)(spark, sfDir).collect().toSeq
      assert(a == b, s"$stored != $self")
    }
  }
}
