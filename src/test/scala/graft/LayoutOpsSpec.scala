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

  test("zorderWrite clusters files into disjoint Morton-key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/t"
    val rnd = new scala.util.Random(11)
    val df = Seq.tabulate(2000)(i =>
      (i.toLong, rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      .toDF("id", "xa", "xb")
    LayoutOps.zorderWrite(df, dir, numFiles = 4, col("xa"), col("xb"))
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length == 4)
    // round-trip completeness
    assert(spark.read.parquet(dir).count() == 2000L)
    // each file must hold a z-range disjoint from every other file's —
    // the repartitionByRange property that makes footer stats prune
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .select(LayoutOps.zValue(col("xa"), col("xb")).as("z"))
        .agg(min(col("z")), max(col("z"))).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
        s"overlapping z ranges: $sorted")
      case _ =>
    }
    // the Spark-side z matches an independent reference interleave
    def zRef(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L)((acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
    val sample = spark.read.parquet(dir).limit(50)
      .select(col("xa"), col("xb"), LayoutOps.zValue(col("xa"), col("xb")).as("z"))
      .collect()
    sample.foreach(r =>
      assert(r.getLong(2) == zRef(r.getLong(0), r.getLong(1))))
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

  test("compactFiles merges a fragmented dir, content identical") {
    val frag = java.nio.file.Files.createTempDirectory("graft_frag").toString
    val out = java.nio.file.Files.createTempDirectory("graft_cpct").toString
    val df = spark.range(10000L).select(col("id"),
      (col("id") % 7).as("k"))
    df.repartition(48).write.mode("overwrite").parquet(frag)
    val stats = LayoutOps.compactFiles(spark, frag, out, targetFileBytes = 1L << 30)
    assert(stats.filesIn == 48)
    assert(stats.filesOut == 1, s"expected one ~GB-target file: $stats")
    assert(stats.bytesIn > 0 && stats.bytesOut > 0)
    // compaction is layout-only: same rows, same values
    val before = df.agg(count(lit(1)), sum("id"), sum("k")).head()
    val after = spark.read.parquet(out).agg(count(lit(1)), sum("id"), sum("k")).head()
    assert(before == after)
  }

  test("compactFiles honors the byte target and the sorted variant clusters") {
    val frag = java.nio.file.Files.createTempDirectory("graft_frag2").toString
    val out = java.nio.file.Files.createTempDirectory("graft_cpct2").toString
    spark.range(200000L).select(col("id"), shiftleft(col("id"), 3).as("v"))
      .repartition(64).write.mode("overwrite").parquet(frag)
    val bytesIn = new java.io.File(frag).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    // pick a target that wants ~4 output files
    val target = math.max(1L, bytesIn / 4)
    val stats = LayoutOps.compactFiles(spark, frag, out, target, sortCols = Seq(col("id")))
    val wanted = ((bytesIn + target - 1) / target).toInt
    assert(stats.filesOut <= wanted && stats.filesOut >= 1,
      s"files ${stats.filesOut} vs wanted <= $wanted")
    // the sorted variant leaves disjoint per-file id ranges (footer
    // stats prune like clusterWrite's)
    val ranges = LayoutOps.fileRanges(spark, out, "id").map(r => (r._2, r._3))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlap: $ranges")
      case _ =>
    }
  }

  test("compactFiles rejects an empty or missing input dir") {
    val empty = java.nio.file.Files.createTempDirectory("graft_empty").toString
    intercept[IllegalArgumentException] {
      LayoutOps.compactFiles(spark, empty, empty + "_out", 1L << 20)
    }
    intercept[IllegalArgumentException] {
      LayoutOps.compactFiles(spark, "/nonexistent/graft", "/tmp/x", 1L << 20)
    }
  }
}
