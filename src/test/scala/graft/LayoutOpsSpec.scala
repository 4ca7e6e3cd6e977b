package graft

import graft.ops.LayoutOps
import org.apache.spark.sql.functions._

class LayoutOpsSpec extends SparkSpec {
  import spark.implicits._

  private def overlapping(ranges: Seq[(String, Long, Long)], lo: Long, hi: Long) =
    ranges.count { case (_, mn, mx) => mx >= lo && mn <= hi }

  test("zValue interleaves bits; ordering groups spatial neighbors") {
    val z = LayoutOps.zValue(lit(0b101), lit(0b011), bits = 3)
    // x=101, y=011 -> z bits (y2 x2 y1 x1 y0 x0) = 0 1 1 0 1 1 = 27
    val got = spark.range(1).select(z).head().getLong(0)
    assert(got == 27L)
    // z of (0,0) is 0; z of (2^k-1, 2^k-1) is 2^2k - 1
    val corners = spark.range(1).select(
      LayoutOps.zValue(lit(0), lit(0), 8),
      LayoutOps.zValue(lit(255), lit(255), 8)).head()
    assert(corners.getLong(0) == 0L && corners.getLong(1) == 65535L)
  }

  test("clusterWrite makes the leading key prune files; zorder prunes both dims") {
    val n = 100000
    // two independent uniform keys - the layout, not the data, decides
    // what a range filter can skip
    val df = spark.range(n.toLong).select(
      (pmod(hash(col("id")), lit(1024)) + 1024).cast("long").as("x"),
      (pmod(hash(col("id") * 7 + 3), lit(1024)) + 1024).cast("long").as("y"))
    val files = 16

    val linear = java.nio.file.Files.createTempDirectory("lin").toString
    val zord = java.nio.file.Files.createTempDirectory("zord").toString
    LayoutOps.clusterWrite(df, linear, files, col("x"))
    LayoutOps.zorderWrite(df, zord, files, col("x") - 1024, col("y") - 1024, bits = 10)

    // narrow range filter on x (the linear sort key): linear is optimal
    val linX = overlapping(LayoutOps.fileRanges(spark, linear, "x"), 1100, 1150)
    val zX = overlapping(LayoutOps.fileRanges(spark, zord, "x"), 1100, 1150)
    // narrow range filter on y (NOT the linear sort key): linear layout
    // cannot skip anything; z-order still prunes
    val linY = overlapping(LayoutOps.fileRanges(spark, linear, "y"), 1100, 1150)
    val zY = overlapping(LayoutOps.fileRanges(spark, zord, "y"), 1100, 1150)

    assert(linX <= 2, s"linear should isolate its own key: $linX")
    assert(linY == 16, s"linear spans all files on the other key: $linY")
    assert(zY <= 8, s"z-order should prune the second dim: $zY")
    assert(zX <= 8, s"z-order should prune the first dim too: $zX")

    // layout changed, data did not
    val a = spark.read.parquet(linear).agg(sum("x"), sum("y")).head()
    val b = spark.read.parquet(zord).agg(sum("x"), sum("y")).head()
    assert(a == b)
  }
}
