package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Exact distributed heavy hitters with Misra-Gries candidate pruning.
  *
  * The naive plan for "every item with frequency > n/k" is a full
  * groupBy-count over the item domain — at 100 TB of text that shuffle
  * carries the ENTIRE token vocabulary (billions of keys, overwhelmingly
  * singletons that cannot possibly qualify). This operator exploits the
  * Misra-Gries guarantee instead:
  *
  *   pass 1 (map-side, NO shuffle on the item domain): each partition
  *     summarizes its items into a k-counter Misra-Gries sketch via
  *     `mapPartitions`. Any item with GLOBAL count > n/k survives in at
  *     least one partition sketch (MG undercounts by at most n_p/k per
  *     partition; an item absent from every sketch has count <= n/k).
  *     Only partitions x k candidate rows leave the map side.
  *   pass 2: the tiny candidate set is distinct-ed and broadcast back;
  *     a second scan counts ONLY candidate items exactly (map-side
  *     partial agg on a domain of <= partitions x k keys), and the
  *     threshold filters on the exact counts.
  *
  * The result is EXACT (same rows as the naive plan, oracle-checkable) —
  * the sketch only prunes the shuffle domain, it never decides the
  * answer. Cost: two scans of the item column, but the shuffled key
  * domain drops from |vocabulary| to |candidates|; at 100 TB the second
  * scan is far cheaper than a vocabulary-wide exchange. The per-task MG
  * state is a bounded k-entry map regardless of input size.
  */
object HeavyHitters {

  /** Misra-Gries summary of one iterator: at most k candidate items.
    * Classic decrement form — k counters, each decrement step removes
    * k+1 occurrences, so undercount <= n/(k+1) < n/k.
    */
  private[graft] def misraGries(items: Iterator[String], k: Int): Map[String, Long] = {
    val counters = mutable.HashMap.empty[String, Long]
    items.foreach { x =>
      if (counters.contains(x)) counters(x) += 1L
      else if (counters.size < k) counters(x) = 1L
      else {
        // decrement all; drop zeros (amortized O(1) per item overall)
        val dead = mutable.ArrayBuffer.empty[String]
        counters.keysIterator.foreach { key =>
          val c = counters(key) - 1L
          if (c == 0L) dead += key else counters(key) = c
        }
        dead.foreach(counters.remove)
      }
    }
    counters.toMap
  }

  /** Merge two weighted summaries and compress back to at most k
    * entries — the mergeable-summaries form of Misra-Gries (Agarwal et
    * al., PODS 2012): add weights, then subtract the (k+1)-th largest
    * combined weight from every entry and keep the strictly-positive
    * survivors. Unlike the sequential decrement fold, this is a pure
    * multiset operation: the result is independent of item order AND of
    * how the input stream was split into batches' exact-count maps —
    * which is what makes it the right kernel for a streaming twin
    * (deterministic under micro-batch replay). Each merge discharges
    * subtracted mass across >= k+1 distinct items, so the total
    * undercount after any merge tree over summaries of total mass n is
    * <= n / (k+1) — the same bound as one sequential MG pass.
    */
  private[graft] def mergeReduce(a: Map[String, Long], b: Map[String, Long],
      k: Int): Map[String, Long] = {
    val combined = mutable.HashMap.empty[String, Long]
    a.foreach { case (item, w) => combined(item) = combined.getOrElse(item, 0L) + w }
    b.foreach { case (item, w) => combined(item) = combined.getOrElse(item, 0L) + w }
    if (combined.size <= k) combined.toMap
    else {
      // (k+1)-th largest weight; ties at the cut all zero out together,
      // so no tie-break rule is needed for determinism
      val cut = combined.values.toArray.sortBy(-_).apply(k)
      combined.iterator.collect {
        case (item, w) if w > cut => item -> (w - cut)
      }.toMap
    }
  }

  /** All items (from `itemCol`, one item per row) whose exact global
    * count exceeds `n / k`, with their exact counts. Two scans, shuffle
    * domain bounded by the candidate set, never the item vocabulary.
    */
  def frequentItems(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k > 1, "heavy hitters need k > 1")
    val spark = items.sparkSession
    import spark.implicits._

    val col0 = col(itemCol)
    // null is reserved for the per-partition total marker row below;
    // null items are not countable keys anyway
    val strings: Dataset[String] =
      items.select(col0.cast("string")).filter(col0.isNotNull).as[String]

    // pass 1: per-partition MG sketches -> candidate items (and n rides
    // along as the sum of sketch-weight + decremented mass? No — MG
    // discards decremented mass, so n comes from a count on the same
    // scan via an Observation-free agg below the explode: each partition
    // emits one (-count-) marker row alongside its candidates).
    val perPartition: Dataset[(String, Long)] = strings.mapPartitions { it =>
      var n = 0L
      val counted = it.map { x => n += 1L; x }
      val sketch = misraGries(counted, k)
      sketch.iterator.map { case (item, w) => (item, w) } ++
        Iterator.single((null: String, n))
    }
    val summaries = perPartition.toDF("item", "w").localCheckpoint()
    val n = summaries.filter(col("item").isNull).agg(sum(col("w"))).head().getLong(0)
    val candidates = summaries.filter(col("item").isNotNull)
      .select(col("item")).distinct()

    // pass 2: exact counts for candidates only — the broadcast semi-join
    // keeps the count's key domain at |candidates|
    items.select(col0.cast("string").as("item"))
      .filter(col("item").isNotNull)
      .join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(n) / lit(k))
  }

  /** `graft_hh('items_table', 'item_col', 'k')` — the SQL spelling of
    * [[frequentItems]] (TVF-parity contract: every bespoke operator
    * family reachable from spark.sql). Emits (item, cnt). The input
    * must be a batch relation: pass 1 is an eager localCheckpoint and
    * the n/k threshold needs the COMPLETE count — the incremental
    * analog is [[graft.streaming.StreamingOps.heavyHittersStream]]
    * (mergeable MG summaries in keyed state), rejected here at
    * analysis time like the other TVFs.
    */
  def sqlBuilder(
      es: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    def arg(i: Int, what: String): String =
      graft.plans.TvfArgs.strLit("graft_hh", es)(i, what)
    if (es.size != 3)
      throw new IllegalArgumentException(
        "graft_hh(items_table, item_col, k)")
    val spark = org.apache.spark.sql.SparkSession.active
    val items = spark.table(arg(0, "items table name"))
    if (items.isStreaming)
      throw new UnsupportedOperationException(
        "graft_hh: the items table is a stream — the exact n/k " +
          "threshold needs the complete count. For streaming heavy " +
          "hitters use StreamingOps.heavyHittersStream (mergeable " +
          "Misra-Gries summaries in keyed state)")
    frequentItems(items, arg(1, "item_col"), arg(2, "k").toInt)
      .queryExecution.analyzed
  }
}
