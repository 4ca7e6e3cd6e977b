package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin equals plain left-semi join (false positives removed)") {
    val big = spark.range(10000).select(col("id").as("k"), (col("id") * 2).as("v"))
    // sparse small side: ~1% of the key space, so the bloom pass prunes hard
    val small = spark.range(100).select((col("id") * 97).as("sk"))
    // tiny sketch + high fpp to force false positives through the pre-filter
    val got = BloomJoin.bloomSemiJoin(big, small, "k", "sk",
      expectedItems = 100L, fpp = 0.2)
      .as[(Long, Long)].collect().toSet
    val want = big.join(small.select(col("sk").as("k")), Seq("k"), "left_semi")
      .as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("bloomPrefilter keeps every true match and prunes most non-matches") {
    val big = spark.range(100000).select(col("id").as("k"))
    val small = spark.range(50).select((col("id") * 1999).as("sk"))
    val pruned = BloomJoin.bloomPrefilter(big, small, "k", "sk",
      expectedItems = 50L, fpp = 0.01)
    val keys = pruned.as[Long].collect().toSet
    val trueKeys = small.as[Long].collect().toSet.filter(_ < 100000L)
    // no false negatives — the Bloom guarantee
    assert(trueKeys.subsetOf(keys))
    // and real pruning: survivors ~= matches + fpp * |big|
    assert(keys.size < 5000, s"bloom pruned too little: ${keys.size}")
  }

  test("non-integral keys are rejected, not silently mismatched") {
    val big = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val small = Seq("a").toDF("sk")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.bloomSemiJoin(big, small, "k", "sk")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("null keys never pass the bloom pre-filter") {
    val big = Seq(Some(1L), None, Some(3L)).toDF("k")
    val small = Seq(1L, 3L).toDF("sk")
    val got = BloomJoin.bloomSemiJoin(big, small, "k", "sk",
      expectedItems = 10L, fpp = 0.01)
      .as[Option[Long]].collect().toSet
    assert(got == Set(Some(1L), Some(3L)))
  }
}
