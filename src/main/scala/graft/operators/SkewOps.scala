package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Skew mitigation for shuffle joins.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.*`) handles most
  * skew at runtime by splitting oversized partitions; salting is the
  * plan-level fallback for the cases AQE can't fix — a single hot key
  * whose rows must still meet every matching right row, e.g. a null-ish
  * default id owning 10% of a 100 TB fact table.
  *
  * `saltedJoin` spreads each left key over `buckets` synthetic sub-keys
  * and replicates the right side once per bucket, so the hot key's rows
  * land in `buckets` different reduce partitions instead of one. The
  * trade: right-side shuffle volume × `buckets` — use when the right side
  * is far smaller than the skewed left (but too big to broadcast, which
  * would avoid the shuffle entirely).
  */
object SkewOps {

  /** Equi-join on `keys` with left-side salting. Result is bit-identical
    * to `left.join(right, keys, joinType)` for inner/left joins.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      buckets: Int, joinType: String = "inner", seed: Long = 42L): DataFrame = {
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      "salting preserves semantics for inner/left joins only")
    val l = left.withColumn("__salt", (rand(seed) * buckets).cast(IntegerType))
    val r = right.withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
