package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Bloom-filter pre-filtered semi join.
  *
  * The scale problem: a semi join of a 100 TB fact table against a
  * filtered dimension shuffles the ENTIRE fact side on the join key
  * before any row is dropped (broadcast-semi avoids the shuffle but
  * still evaluates the hash probe after a full scan materializes every
  * row into the exchange-input projection). A Bloom filter built from
  * the small side and pushed into a `filter` BEFORE the join drops the
  * vast majority of non-matching fact rows at the scan — only the
  * survivors (matches + `fpp` false positives) reach the join. This is
  * exactly what Spark's own runtime row-group/semi-join filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects for
  * qualifying plans; this operator makes the technique explicit and
  * composable for plans the optimizer rule does not cover (e.g. a
  * pre-aggregated or multi-step small side).
  *
  * Exactness: the trailing left-semi join removes the Bloom false
  * positives, so the result EXACTLY equals `big SEMI JOIN small` — the
  * Bloom pass only prunes work, never changes semantics. That is why
  * `q_bloom_semi_join`'s DuckDB oracle is a plain `IN` subquery.
  *
  * Keys must be integral: the sketch probe is `mightContainLong`, and a
  * string key would be inserted as UTF8 bytes but probed after an
  * implicit cast — silently dropping true matches. Both entry points
  * `require` an integral key type instead.
  *
  * The probe is the native codegen'd `graft_might_contain` expression
  * ([[graft.functions.BloomMightContain]]): one un-boxed sketch lookup
  * per row inside WholeStageCodegen. The serialized filter rides in the
  * plan as a binary literal — deserialized once per task, broadcast once
  * per stage with the task binary (~1.2 MB at the default sizing).
  */
object BloomJoin {

  private def requireIntegralKey(df: DataFrame, key: String, side: String): Unit = {
    val dt = df.schema(key).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"BloomJoin $side key '$key' must be integral (probe is " +
        s"mightContainLong); got $dt — hash non-integral keys to a long " +
        "(e.g. xxhash64) first")
  }

  /** `big` rows whose `bigKey` appears in `small.smallKey` — exact semi
    * join semantics, Bloom-pruned before the shuffle. The small side's
    * key projection is localCheckpointed: building the sketch is an
    * eager action, and without materialization the trailing semi join
    * would re-execute the whole small-side plan a second time.
    *
    * @param expectedItems sizing for the sketch (number of distinct small
    *                      side keys; over-sizing only costs bits)
    * @param fpp           target false-positive rate of the PRE-filter
    */
  def bloomSemiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    requireIntegralKey(small, smallKey, "small")
    val smallKeys = small.select(col(smallKey).as(bigKey)).localCheckpoint()
    bloomPrefilter(big, smallKeys, bigKey, bigKey, expectedItems, fpp)
      .join(smallKeys, Seq(bigKey), "left_semi")
  }

  /** The Bloom pre-filter alone (no trailing join) — for callers that
    * tolerate `fpp` false positives in exchange for zero join cost, e.g.
    * candidate pruning feeding an exact verifier downstream.
    */
  def bloomPrefilter(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    requireIntegralKey(big, bigKey, "big")
    requireIntegralKey(small, smallKey, "small")
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    // Null keys: the expression yields null, the filter drops the row —
    // the same outcome a null key has in the exact semi join downstream.
    big.filter(call_function("graft_might_contain",
      col(bigKey).cast(LongType), lit(bos.toByteArray)))
  }

  /** `graft_bloom('big_table', 'small_table', 'big_key', 'small_key'
    * [, 'expected_items'[, 'fpp']])` — the SQL spelling of
    * [[bloomSemiJoin]] (TVF-parity contract: every bespoke operator
    * family reachable from spark.sql). Exact semi-join semantics,
    * Bloom-pruned before the shuffle. Both sides must be batch
    * relations: building the sketch is an eager action over the
    * COMPLETE small side — for a streaming probe side, build the
    * filter once from the batch dimension and apply the
    * `graft_might_contain` expression to the stream directly.
    */
  def sqlBuilder(
      es: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    def arg(i: Int, what: String): String =
      graft.plans.TvfArgs.strLit("graft_bloom", es)(i, what)
    if (es.size < 4 || es.size > 6)
      throw new IllegalArgumentException(
        "graft_bloom(big_table, small_table, big_key, small_key" +
          "[, expected_items[, fpp]])")
    val spark = org.apache.spark.sql.SparkSession.active
    def side(i: Int, what: String): DataFrame = {
      val t = spark.table(arg(i, s"$what table name"))
      if (t.isStreaming)
        throw new UnsupportedOperationException(
          s"graft_bloom: the $what table is a stream — the sketch build " +
            "is an eager action over the complete small side. Build the " +
            "filter from the batch dimension once and apply the " +
            "graft_might_contain expression to the stream directly")
      t
    }
    val big = side(0, "big")
    val small = side(1, "small")
    val expected =
      if (es.size > 4) arg(4, "expected_items").toLong else 1000000L
    val fpp = if (es.size > 5) arg(5, "fpp").toDouble else 0.01
    bloomSemiJoin(big, small, arg(2, "big_key"), arg(3, "small_key"),
      expected, fpp).queryExecution.analyzed
  }
}
