package graft

import org.apache.spark.sql.functions._

/** The stored-layout guarantees behind q_bucket_join / q_bucket_prune:
  * co-location (zero exchanges through join + bucket-key aggregate —
  * budget-pinned in ExplainSpec) and bucket PRUNING (an equality filter
  * on the bucket key scans one bucket's files, asserted here off the
  * scan's own SelectedBucketsCount report).
  */
class BucketedSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("equality filter on the bucket key prunes to 1 of 8 buckets") {
    // the REGISTERED query: its bucket-key aggregate gives the scan an
    // interesting partition requirement, so the planner keeps the
    // bucketed scan (a bare filter would get 'Bucketed: false (disabled
    // by query planner)' and lose the pruning with it)
    val pruned = SparkEntry.queries("q_bucket_prune")(spark, dir)
    val txt = pruned.queryExecution.executedPlan.toString
    assert(txt.contains("SelectedBucketsCount: 1 out of 8"), txt)
    // the join query's unfiltered scans read all 8
    val full = SparkEntry.queries("q_bucket_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(full.contains("SelectedBucketsCount: 8 out of 8"), full)
    // rows actually come back (the pruned bucket holds the probe key)
    assert(pruned.count() > 0)
  }

  test("bucketed tables are keyed per sf-dir (no cross-dir reuse)") {
    val (lt1, ot1) = graft.operators.BucketedTables.ensure(spark, dir)
    val (lt2, _) = graft.operators.BucketedTables.ensure(spark, "/root/testdata/sf0.01")
    assert(lt1 != lt2)
    assert(spark.table(lt1).count() != spark.table(lt2).count())
    assert(ot1.contains("orders"))
  }

  test("an in-process rewrite of the source dir invalidates the bucketed cache") {
    // stage a mutable copy of the sf0.001 tables, ensure() against it,
    // then REWRITE lineitem in place — the content fingerprint must
    // mint a new table identity whose bucketed copy reflects the new
    // bytes (the pre-fingerprint cache served the stale first build)
    val work = java.nio.file.Files.createTempDirectory("bkt_invalidate").toString
    Seq("lineitem", "orders").foreach(t =>
      Tables(spark, dir, t).write.parquet(s"$work/$t.parquet"))
    val (lt1, _) = graft.operators.BucketedTables.ensure(spark, work)
    val n1 = spark.table(lt1).count()
    val p1 = graft.operators.BucketedTables.probeKey(spark, work)

    val half = Tables(spark, work, "lineitem")
      .filter(col("l_orderkey") % 2 === 0).localCheckpoint()
    half.write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    val (lt2, _) = graft.operators.BucketedTables.ensure(spark, work)
    assert(lt2 != lt1, "rewrite did not change the table identity")
    val n2 = spark.table(lt2).count()
    assert(n2 == half.count() && n2 < n1,
      s"bucketed copy stale after rewrite: $n2 vs $n1")
    // the cached probe key is invalidated with it: only even orderkeys
    // survive, so the smallest key ending in 7 must change or vanish
    val p2 = graft.operators.BucketedTables.probeKey(spark, work)
    assert(p2.forall(_ % 2 == 0), s"stale probe key $p2 (was $p1)")
  }
}
