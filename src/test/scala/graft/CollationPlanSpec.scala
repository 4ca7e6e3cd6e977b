package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExecBase
import org.apache.spark.sql.functions._

/** Measured map of Spark 4.1's collation plan cliffs (round-10 fallout:
  * q_collated_join regressed to 12.5 s when the raw fact sorted through
  * a collated-key SortMergeJoin). This suite pins which physical
  * strategy each relational operator keeps when its key is UTF8_LCASE,
  * so the next collation-touching query starts from measured knowledge
  * instead of rediscovering a cliff in a bench sweep.
  *
  * What Spark 4.1.2 actually plans (all asserted below, AQE off for
  * static shape like ExplainSpec):
  *   - groupBy / distinct on a collated key: falls to SORT-based
  *     aggregation (SortAggregateExec) — collated grouping keys are not
  *     UnsafeRow hash-aggregatable, so every group-by-collated-key pays
  *     a per-partition sort. Aggregate on a BINARY key below, attach
  *     collation above (q_collated_join's shape) to keep corpus-sized
  *     aggregation hash-based.
  *   - join on a SCHEMA-LEVEL collated column (the key IS a collated
  *     attribute): broadcast works — BHJ builds on
  *     `collationkey(...)`-wrapped keys. But the same join spelled with
  *     `collate()` EXPRESSIONS in the join condition ignores even an
  *     explicit broadcast() hint and falls to SortMergeJoin — THE r10
  *     12.5 s cliff (q_collated_join collates inside the condition).
  *     Rule: collate the COLUMN in a projection, join on plain `===`.
  *   - window partitionBy on a collated key: plans the usual
  *     Window-over-sorted-exchange; collation costs nothing new (windows
  *     sort within partitions anyway).
  *
  * If a Spark upgrade flips any of these (e.g. hash aggregate learning
  * collation keys), the matching assert fails and the binary-key
  * workarounds can be revisited for the simpler plan.
  */
class CollationPlanSpec extends SparkSpec {

  private def collatedDf: DataFrame = {
    import spark.implicits._
    Seq(("Alpha", 1L), ("ALPHA", 2L), ("beta", 3L), ("Beta", 4L))
      .toDF("k", "v")
      .select(collate(col("k"), "UTF8_LCASE").as("k"), col("v"))
  }

  /** Static (pre-AQE) physical plan, the same regime ExplainSpec audits. */
  private def staticPlan(df: DataFrame): SparkPlan = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("groupBy on a UTF8_LCASE key falls to SortAggregate (the agg cliff)") {
    val plan = staticPlan(collatedDf.groupBy("k").agg(sum("v").as("s")))
    assert(plan.collect { case s: SortAggregateExec => s }.nonEmpty,
      s"collated groupBy no longer sort-based — revisit binary-key workarounds:\n$plan")
    assert(plan.collect { case h: HashAggregateExec => h }.isEmpty &&
      plan.collect { case o: ObjectHashAggregateExec => o }.isEmpty,
      s"unexpected hash aggregate on a collated key:\n$plan")
    // control: the identical groupBy on the binary key stays hash-based —
    // why q_collated_join aggregates on binary BELOW the collated join
    val binPlan = staticPlan(collatedDf
      .select(col("k").cast("string").as("k"), col("v"))
      .groupBy("k").agg(sum("v").as("s")))
    assert(binPlan.collect { case h: HashAggregateExec => h }.nonEmpty,
      s"binary-key control groupBy should hash-aggregate:\n$binPlan")
    // semantics: the sort-based agg still merges case-insensitively
    val rows = collatedDf.groupBy("k").agg(sum("v").as("s"))
      .orderBy("s").collect()
    assert(rows.length == 2 && rows.map(_.getLong(1)).toSeq == Seq(3L, 7L))
  }

  test("distinct on a UTF8_LCASE key is sort-based too") {
    val plan = staticPlan(collatedDf.select("k").distinct())
    assert(plan.collect { case s: SortAggregateExec => s }.nonEmpty,
      s"collated distinct no longer sort-based:\n$plan")
    assert(collatedDf.select("k").distinct().count() == 2L)
  }

  test("collated-key join: explicit broadcast() hint IS honored (collationkey BHJ)") {
    val dim = collatedDf.select(col("k").as("dk")).distinct()
    val plan = staticPlan(collatedDf.join(broadcast(dim), col("k") === col("dk")))
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"hinted collated join stopped broadcasting:\n$plan")
    // the build keys go through collationkey(), i.e. the hash IS
    // collation-aware — pin that so semantics can't silently change
    assert(plan.collect { case b: BroadcastHashJoinExec => b }
      .head.leftKeys.exists(_.toString.contains("collationkey")),
      s"BHJ no longer hashes via collationkey:\n$plan")
  }

  test("collate() EXPRESSIONS in the join condition defeat the broadcast hint (the r10 cliff)") {
    import spark.implicits._
    val fact = Seq(("CLICK", 1L), ("click", 2L), ("View", 3L)).toDF("t", "v")
    val dim = Seq(("Click", "engagement"), ("VIEW", "engagement")).toDF("code", "cat")
    // q_collated_join's original spelling: collation applied inside the
    // condition. The explicit broadcast() hint is silently IGNORED and
    // both sides shuffle+sort — at sf0.1 this put the raw event fact
    // through an SMJ against a 5-row dim (12.5 s). Pinned so the cliff
    // stays documented even after the query itself was reshaped.
    val joined = fact.join(broadcast(dim),
      collate(col("t"), "UTF8_LCASE") === collate(col("code"), "UTF8_LCASE"))
    val plan = staticPlan(joined)
    assert(plan.collect { case s: SortMergeJoinExec => s }.nonEmpty,
      "collate()-in-condition join now honors the broadcast hint — " +
        s"q_collated_join's binary-key pre-aggregate can be revisited:\n$plan")
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.isEmpty, s"$plan")
    assert(joined.count() == 3L)
    // The FIX spelling: collate the columns in a projection, join on
    // plain === — the same hint is honored and the fact never shuffles.
    val cFact = fact.select(collate(col("t"), "UTF8_LCASE").as("t"), col("v"))
    val cDim = dim.select(collate(col("code"), "UTF8_LCASE").as("code"), col("cat"))
    val fixed = staticPlan(cFact.join(broadcast(cDim), col("t") === col("code")))
    assert(fixed.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"schema-level collated join stopped broadcasting:\n$fixed")
  }

  test("window partitionBy on a UTF8_LCASE key keeps the normal window plan") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("v")
    val df = collatedDf.select(col("k"), col("v"), row_number().over(w).as("rn"))
    val plan = staticPlan(df)
    assert(plan.collect { case we: WindowExecBase => we }.nonEmpty,
      s"expected a window node, got:\n$plan")
    assert(plan.collect { case e: ShuffleExchangeExec => e }.nonEmpty,
      s"expected a partitionBy exchange, got:\n$plan")
    // case-insensitive partitions: ranks restart once per collation group
    assert(df.collect().count(_.getInt(2) == 1) == 2,
      "expected 2 collation groups")
  }
}
