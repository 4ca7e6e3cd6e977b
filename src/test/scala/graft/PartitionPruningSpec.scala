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

  test("broadcast dim filter dynamically prunes fact partitions at runtime (DPP)") {
    // the star-schema runtime pruning path: the fact is partitioned on
    // the join key, the dim filter is only known at run time — DPP
    // injects the dim's key set as a partition filter on the fact scan,
    // so a 100 TB fact reads only the partitions the filtered dim can
    // match (here: one region's 5 of 25 nation partitions).
    val sf = "/root/testdata/sf0.001"
    val d = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables(spark, sf, "customer")
      .write.partitionBy("c_nationkey").mode("overwrite").parquet(d)
    val fact = spark.read.parquet(d)
    def dim = Tables(spark, sf, "nation").filter(col("n_regionkey") === 0)
    val joined = fact.join(dim, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n"))

    // the join has exchanges, so AQE wraps the plan and the fact scan is
    // not a collectable leaf — assert on the printed plan, where the
    // scan's PartitionFilters carry the injected dynamicpruning subquery
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan)

    // and the pruned plan computes exactly the plain join's result
    val expected = Tables(spark, sf, "customer")
      .join(dim, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected && got.nonEmpty)
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
