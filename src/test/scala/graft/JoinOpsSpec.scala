package graft

import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.functions._

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asOf attaches most recent right row at-or-before, null when none") {
    val trades = Seq(
      ("A", 10L, 1), ("A", 25L, 2), ("B", 5L, 3)
    ).toDF("sym", "ts", "trade_id")
    val quotes = Seq(
      ("A", 8L, 100.0), ("A", 10L, 101.0), ("A", 20L, 102.0), ("B", 9L, 50.0)
    ).toDF("sym", "ts", "px")

    val j = AsOfJoin.asOf(trades, quotes, "sym", "ts", Seq("px"))
      .select("sym", "ts", "trade_id", "asof_px").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet

    assert(j == Set(
      ("A", 10L, 1, 101.0), // tie: right row at equal ts counts
      ("A", 25L, 2, 102.0),
      ("B", 5L, 3, null)))  // no quote at-or-before
  }

  test("bandJoin equals the naive range-predicate join") {
    val l = Seq.tabulate(200)(i => (i.toLong, i * 0.37)).toDF("lid", "lv")
    val r = Seq.tabulate(150)(i => (i.toLong, i * 0.53)).toDF("rid", "rv")
    val w = 1.5
    val banded = RangeJoin.bandJoin(l, r, col("lv"), col("rv"), w)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = l.crossJoin(r)
      .filter(col("lv") >= col("rv") - w && col("lv") <= col("rv") + w)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(banded == naive)
    assert(banded.nonEmpty)
  }
}
