package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** One-off: print each query's static shuffle-exchange count at sf0.001
  * with AQE off — the snapshot ExplainSpec embeds as exact budgets.
  */
object ShuffleCounts {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan
      val n = plan.collectWithSubqueries { case e: ShuffleExchangeExec => e }.size
      println(s"""SHUF "$name" -> $n,""")
    }
    spark.stop()
  }
}
