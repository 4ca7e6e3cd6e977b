package graft

import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Plan-regression gate over the ENTIRE query catalog: every registered
  * query's physical plan is audited for the anti-patterns past rounds
  * hunted down one at a time — all-pairs join nodes, interpreted
  * row-at-a-time Scala UDFs, Python evaluation, and static shuffle-count
  * creep. Running it in `sbt test` turns those one-off plan audits into a
  * standing invariant: a future edit that sneaks a CartesianProduct or an
  * extra exchange into any of the 99 plans fails CI, not a bench review.
  *
  * AQE is disabled while PLANNING here (runtime re-planning would hide
  * the static shape; execution never happens in this suite), and shuffle
  * counts are of the pre-AQE plan — note ReuseExchange materializes at
  * runtime, so identical self-join subtrees count each occurrence.
  */
class ExplainSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  /** Static shuffle-exchange budget. The default is deliberately tight;
    * queries with a justified higher count (multi-level aggregations,
    * set-operation stacks, self-joins whose exchanges AQE reuses at
    * runtime) are budgeted explicitly at their CURRENT count, so any new
    * shuffle anywhere still fails the gate.
    */
  private val defaultMaxShuffles = 5
  private val shuffleBudget: Map[String, Int] = Map.empty

  private def audit(): Seq[String] = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val nodes = plan.collectWithSubqueries { case n => n }
        val cartesian = nodes.collect { case c: CartesianProductExec => c }
        val pythonNodes = nodes.filter(_.getClass.getSimpleName.contains("Python"))
        val scalaUdfs = nodes.flatMap(_.expressions.flatMap(_.collect {
          case u: ScalaUDF => u
        }))
        val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
        val budget = shuffleBudget.getOrElse(name, defaultMaxShuffles)
        Seq(
          if (cartesian.nonEmpty) Some(s"$name: CartesianProduct in plan") else None,
          if (pythonNodes.nonEmpty)
            Some(s"$name: Python evaluation node ${pythonNodes.head.nodeName}") else None,
          if (scalaUdfs.nonEmpty)
            Some(s"$name: interpreted Scala UDF ${scalaUdfs.head.udfName.getOrElse("?")}") else None,
          if (shuffles > budget)
            Some(s"$name: $shuffles shuffle exchanges (budget $budget)") else None
        ).flatten
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("no query plans a CartesianProduct, UDF, Python eval, or over-budget shuffles") {
    val violations = audit()
    assert(violations.isEmpty, violations.mkString("\n  ", "\n  ", ""))
  }
}
