package graft

import graft.operators.SkewOps
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data (inner)") {
    // hot key: 0 owns 80% of left rows
    val left = spark.range(5000)
      .select(when(col("id") % 5 =!= 0, col("id") % 50).otherwise(0L).as("k"),
        col("id").as("lv"))
    val right = spark.range(50).select(col("id").as("k"), (col("id") * 10).as("rv"))

    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .as[(Long, Long, Long)].collect().toSet
    val salted = SkewOps.saltedJoin(left, right, Seq("k"), buckets = 8)
      .select("k", "lv", "rv").as[(Long, Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin preserves left-join nulls for unmatched keys") {
    val left = Seq((1L, "a"), (2L, "b"), (99L, "zz")).toDF("k", "lv")
    val right = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "rv")
    val rows = SkewOps.saltedJoin(left, right, Seq("k"), 4, "left")
      .select("k", "lv", "rv").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) null else r.getDouble(2)))
      .toSet
    assert(rows == Set((1L, "a", 10.0), (2L, "b", 20.0), (99L, "zz", null)))
  }

  test("saltedJoin rejects semantics-breaking join types") {
    val df = Seq((1L, 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SkewOps.saltedJoin(df, df, Seq("k"), 4, "full_outer")
    }
  }
}
