package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** At 100 TB the cheapest byte is the one never read: this suite pins the
  * two scan-elision mechanisms the engine's layouts rely on — hive-style
  * partition pruning (directory-level) and parquet predicate pushdown
  * (row-group-level) — by auditing the physical plan, not just results.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_part").toString
    Seq.tabulate(100)(i => (i.toLong, if (i % 4 == 0) "purchase" else "click", i * 1.5))
      .toDF("id", "etype", "v")
      .write.partitionBy("etype").mode("overwrite").parquet(d)
    d
  }

  test("partition predicate prunes directories at the scan") {
    val filtered = spark.read.parquet(dir).filter(col("etype") === "purchase")
    val scan = filtered.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.get
    // the predicate lands in PartitionFilters (directory pruning), and
    // only 1 of the 2 etype= partitions survives planning
    assert(scan.partitionFilters.exists(_.toString.contains("purchase")),
      scan.partitionFilters.mkString(", "))
    assert(scan.selectedPartitions.partitionCount == 1,
      s"selected ${scan.selectedPartitions.partitionCount}")
    assert(filtered.count() == 25)
  }

  test("rank-filter top-k per group plans a WindowGroupLimit (partial per-partition pruning)") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq.tabulate(100)(i => (i % 5, i, i * 1.1)).toDF("g", "id", "v")
    val w = Window.partitionBy("g").orderBy(col("v").desc)
    val topk = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
    // Spark's InferWindowGroupLimit rewrites rank-predicate windows so
    // each task keeps only k rows per group BEFORE the window shuffle's
    // sort — the built-in answer to top-k-per-key at scale (and why
    // q_window_rank needs no custom operator).
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(topk.count() == 15)
  }

  test("data predicate reaches the parquet reader as a pushed filter; projection prunes columns") {
    val q = spark.read.parquet(dir).filter(col("v") > 60.0).select("id")
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.get
    val meta = scan.metadata
    assert(meta("PushedFilters").contains("GreaterThan(v,60.0)"), meta("PushedFilters"))
    // ReadSchema must not include pruned columns
    assert(meta("ReadSchema").contains("id") && !meta("ReadSchema").contains("etype"),
      meta("ReadSchema"))
    assert(q.count() == 59)
  }
}
