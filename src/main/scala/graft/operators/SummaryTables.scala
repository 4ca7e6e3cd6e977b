package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.plans.SummaryRewrite
import graft.plans.SummaryRewrite.SummarySpec

/** The materialized-view fixture for [[graft.plans.SummaryRewrite]]: a
  * write-once orders rollup keyed (o_orderpriority, o_orderstatus) with
  * exact-derivable partials — count, min/max price, and a LongType sum
  * partial — built under a [[graft.ops.ContentTag]] identity (a base
  * rewrite mints a new tag, building AND registering a fresh summary,
  * so the rewrite can never serve stale bytes in-process: freshness is
  * the registrar's contract, made content-addressed here).
  *
  * At 100 TB this is the pattern's whole point: the summary is
  * |priority × status|-sized (dozens of rows), so every rewritten
  * aggregate answers from a constant-size scan instead of the fact
  * corpus.
  */
object SummaryTables {

  private def tagFor(dir: String): String =
    graft.ops.ContentTag.of(dir, Seq("orders"))

  /** Idempotently build + register the orders summary for `dir`'s
    * current contents; returns the summary path.
    */
  def ensure(s: SparkSession, dir: String): String = synchronized {
    val tag = tagFor(dir)
    val root = s"${sys.props("java.io.tmpdir")}/graft_summary/$tag"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$root/_SUCCESS")))
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          sum(col("o_orderkey")).as("sum_okey"))
        .coalesce(1).write.mode("overwrite").parquet(root)
    // registration is idempotent (replace) and tag-keyed with the
    // summary itself: same call both builds and (re)binds
    SummaryRewrite.register(s"$dir/orders.parquet", SummarySpec(
      summaryPath = root,
      keys = Seq("o_orderpriority", "o_orderstatus"),
      countCol = "cnt",
      minCols = Map("o_totalprice" -> "min_price"),
      maxCols = Map("o_totalprice" -> "max_price"),
      sumCols = Map("o_orderkey" -> "sum_okey")))
    root
  }
}
