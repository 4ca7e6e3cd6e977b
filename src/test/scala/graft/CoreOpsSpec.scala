package graft

import graft.ops.CoreOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core operator semantics vs the reference pipeline's transforms
  * (zwilson999/lol_data_pipeline `src/api/utils/utils.py`).
  */
class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  private val nestedSchema = StructType(Seq(
    StructField("metadata", StructType(Seq(
      StructField("matchId", StringType),
      StructField("participants", ArrayType(StringType))))),
    StructField("info", StructType(Seq(
      StructField("gameId", LongType),
      StructField("mode", StructType(Seq(
        StructField("name", StringType)))))))))

  private def nestedDf = spark.createDataFrame(
    java.util.List.of(
      Row(Row("NA1_1", Seq("p1", "p2")), Row(7L, Row("ARAM")))),
    nestedSchema)

  test("flattenStruct flattens nested structs to sep-joined leaves, keeps arrays") {
    val flat = CoreOps.flattenStruct(nestedDf)
    assert(flat.columns.toSeq ==
      Seq("metadata_matchId", "metadata_participants", "info_gameId", "info_mode_name"))
    val r = flat.head()
    assert(r.getString(0) == "NA1_1")
    assert(r.getSeq[String](1) == Seq("p1", "p2"))
    assert(r.getLong(2) == 7L)
    assert(r.getString(3) == "ARAM")
  }

  test("lastElementFlatten reproduces the reference's last-element-wins list quirk") {
    // reference utils/utils.py:37-41: {'a':[{'x':1},{'x':2}]} flattens to {'x':2}
    val df = Seq((1L, Seq((1, "a"), (2, "b")))).toDF("id", "arr")
      .withColumn("arr", col("arr").cast("array<struct<x:int,y:string>>"))
    val flat = CoreOps.lastElementFlatten(df, "arr")
    assert(flat.columns.toSeq == Seq("id", "arr_x", "arr_y"))
    assert(flat.head() == Row(1L, 2, "b"))
  }

  test("msToDate converts unix millis to UTC yyyy-MM-dd incl. epoch/day boundaries") {
    val df = Seq(0L, 86399999L, 86400000L, 1633478400123L).toDF("ms")
      .select(CoreOps.msToDate(col("ms")).as("d"))
    assert(df.as[String].collect().toSeq ==
      Seq("1970-01-01", "1970-01-01", "1970-01-02", "2021-10-06"))
  }

  test("lookupMap maps known keys, defaults unknown (reference get_queue_id)") {
    val queueMap = Seq("draft" -> 400, "blind" -> 430, "aram" -> 450)
    val df = Seq("draft", "aram", "unknown").toDF("q")
      .select(CoreOps.lookupMap(col("q"), queueMap).as("id"))
    assert(df.collect().toSeq == Seq(Row(400), Row(450), Row(null)))
  }

  test("dedup applies the reference's intended distinct semantics") {
    val df = Seq("a", "b", "a", "c", "b").toDF("match_id")
    assert(CoreOps.dedup(df).count() == 3)
    assert(CoreOps.dedup(df, Seq("match_id")).count() == 3)
  }

  test("dedup bug-compat mode reproduces the A1 quirk (pre-dedup list returned)") {
    // reference matches.py:53: the distinct set is computed then thrown
    // away — observable behavior is identity, duplicates preserved in
    // input order
    val df = Seq("a", "b", "a", "c", "b").toDF("match_id")
    assert(CoreOps.dedup(df, bugCompat = true).as[String].collect().toSeq ==
      Seq("a", "b", "a", "c", "b"))
  }

  test("statusFilter keeps only ok rows (reference pipeline.py:45)") {
    val df = Seq((1, 200), (2, 404), (3, 200), (4, 429)).toDF("id", "status")
    assert(CoreOps.statusFilter(df).select("id").as[Int].collect().toSeq == Seq(1, 3))
  }

  test("truncateLoad overwrites fully (reference db.py truncate-and-load)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tl").toString + "/t"
    CoreOps.truncateLoad(Seq(1, 2, 3).toDF("v"), dir)
    CoreOps.truncateLoad(Seq(9).toDF("v"), dir)
    assert(spark.read.parquet(dir).as[Int].collect().toSeq == Seq(9))
  }

  test("upsert keeps latest version per key; updates win version ties") {
    val dir = java.nio.file.Files.createTempDirectory("graft_up").toString + "/t"
    // initial load
    CoreOps.upsert(Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "ver", "v"),
      dir, "k", "ver")
    // update k=1 (higher version), tie on k=2 (update must win), insert k=3
    CoreOps.upsert(Seq((1L, 2L, "a2"), (2L, 1L, "b2"), (3L, 1L, "c")).toDF("k", "ver", "v"),
      dir, "k", "ver")
    val got = spark.read.parquet(dir).as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, "a2"), (2L, 1L, "b2"), (3L, 1L, "c")))
    // stale update (lower version) must NOT clobber
    CoreOps.upsert(Seq((1L, 1L, "old")).toDF("k", "ver", "v"), dir, "k", "ver")
    val after = spark.read.parquet(dir).as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(after.head == ((1L, 2L, "a2")))
  }

  test("deleteWhere (unpartitioned): removes matches, keeps the rest, counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_del").toString + "/t"
    Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c")).toDF("id", "tag")
      .write.parquet(dir)
    assert(CoreOps.deleteWhere(spark, dir, col("tag") === "a") == 2L)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().sortBy(_._1)
      .toSeq == Seq((2L, "b"), (4L, "c")))
    // no matches: table untouched, zero reported
    assert(CoreOps.deleteWhere(spark, dir, col("tag") === "zzz") == 0L)
    assert(spark.read.parquet(dir).count() == 2L)
  }

  test("deleteWhere retains (and never counts) NULL-predicate rows") {
    // standard DELETE semantics: a predicate over a nullable column
    // evaluates to NULL on NULL input — those rows must survive in the
    // kept set, not vanish uncounted (the `!predicate` trap)
    val dir = java.nio.file.Files.createTempDirectory("graft_del_null").toString + "/t"
    Seq((1L, Some("a")), (2L, None), (3L, Some("b")), (4L, None))
      .toDF("id", "tag").write.parquet(dir)
    assert(CoreOps.deleteWhere(spark, dir, col("tag") === "a") == 1L)
    assert(spark.read.parquet(dir).select("id").as[Long].collect().sorted
      .toSeq == Seq(2L, 3L, 4L))
    // partitioned path, same semantics: NULL-user rows in a hit
    // partition must be rewritten into the survivors
    val pdir = java.nio.file.Files.createTempDirectory("graft_del_nullp").toString + "/t"
    Seq((1L, Some("u1"), "d1"), (2L, None, "d1"), (3L, Some("u2"), "d2"))
      .toDF("id", "user", "day").write.partitionBy("day").parquet(pdir)
    assert(CoreOps.deleteWhere(spark, pdir, col("user") === "u1",
      partCols = Seq("day")) == 1L)
    assert(spark.read.parquet(pdir).select("id").as[Long].collect().sorted
      .toSeq == Seq(2L, 3L))
  }

  test("deleteWhere replays an interrupted partitioned removal from the pending marker") {
    val dir = java.nio.file.Files.createTempDirectory("graft_del_replay").toString + "/t"
    Seq((1L, "u1", "d1"), (2L, "u2", "d2")).toDF("id", "user", "day")
      .write.partitionBy("day").parquet(dir)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // simulate a crash mid-call: d1 was fully matched, the marker was
    // written, but the process died before fs.delete(day=d1)
    val marker = new org.apache.hadoop.fs.Path(dir, CoreOps.PendingDeleteMarker)
    val out = fs.create(marker, true)
    out.write("day=d1".getBytes("UTF-8")); out.close()
    // next call (unrelated predicate) finishes the removal first
    assert(CoreOps.deleteWhere(spark, dir, col("user") === "zzz",
      partCols = Seq("day")) == 0L)
    assert(!new java.io.File(s"$dir/day=d1").exists())
    assert(!fs.exists(marker))
    assert(spark.read.parquet(dir).select("id").as[Long].collect().toSeq ==
      Seq(2L))
  }

  test("deleteWhere recovers the delete-then-crash staging window") {
    val dir = java.nio.file.Files.createTempDirectory("graft_del_rec").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag").write.parquet(dir)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(dir + ".staging")
    Seq((2L, "b")).toDF("id", "tag").write.parquet(staging.toString)
    fs.create(new org.apache.hadoop.fs.Path(staging, CoreOps.CommitMarker), true).close()
    assert(fs.delete(new org.apache.hadoop.fs.Path(dir), true))
    // next call finishes the swap, then applies its own (no-op) delete
    assert(CoreOps.deleteWhere(spark, dir, col("tag") === "zzz") == 0L)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSeq ==
      Seq((2L, "b")))
  }

  test("deleteWhere (partitioned): rewrites only affected partitions, drops emptied ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft_del_p").toString + "/t"
    Seq((1L, "u1", "d1"), (2L, "u2", "d1"), (3L, "u1", "d2"), (4L, "u1", "d3"))
      .toDF("id", "user", "day")
      .write.partitionBy("day").parquet(dir)
    val d1Files = new java.io.File(s"$dir/day=d1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified))
    // u1 appears in d1 (with a survivor), d2 (sole row), d3 (sole row);
    // delete u1 rows only where day != d3 — d3 must stay untouched
    val n = CoreOps.deleteWhere(spark, dir,
      col("user") === "u1" && col("day") =!= "d3", partCols = Seq("day"))
    assert(n == 2L)
    val left = spark.read.parquet(dir).select("id").as[Long].collect().sorted.toSeq
    assert(left == Seq(2L, 4L))
    // d2 was fully deleted -> its directory is gone
    assert(!new java.io.File(s"$dir/day=d2").exists())
    // d1 was rewritten (it contained a match)
    val d1After = new java.io.File(s"$dir/day=d1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified))
    assert(d1After.nonEmpty && d1After.toSet != d1Files.toSet)
    // d3 files untouched (never read, never rewritten)
    assert(new java.io.File(s"$dir/day=d3").exists())
  }

  test("deleteWhere escapes special characters in partition values (Hive path encoding)") {
    // a colon (or any of Hive's escaped chars) in a partition VALUE is
    // written to disk %-encoded; the emptied-partition delete must
    // target that encoded path, not a raw-interpolated one
    val dir = java.nio.file.Files.createTempDirectory("graft_del_esc").toString + "/t"
    Seq((1L, "us:west"), (2L, "emea"), (3L, "us:west"))
      .toDF("id", "region")
      .write.partitionBy("region").parquet(dir)
    val escaped = new java.io.File(s"$dir/region=us%3Awest")
    assert(escaped.exists()) // precondition: Spark wrote the escaped form
    val n = CoreOps.deleteWhere(spark, dir,
      col("region") === "us:west", partCols = Seq("region"))
    assert(n == 2L)
    assert(!escaped.exists()) // emptied partition dir actually removed
    val left = spark.read.parquet(dir).select("id").as[Long].collect().toSeq
    assert(left == Seq(2L))
  }

  test("upsert recovers a completed-but-unswapped staging after a delete-crash") {
    val dir = java.nio.file.Files.createTempDirectory("graft_up_rec").toString + "/t"
    CoreOps.upsert(Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "ver", "v"),
      dir, "k", "ver")
    // Simulate the crash window between fs.delete(target) and fs.rename:
    // the merged table sits complete (commit-marked) in .staging while
    // the target path is gone.
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(dir)
    val staging = new org.apache.hadoop.fs.Path(dir + ".staging")
    Seq((1L, 2L, "merged"), (2L, 1L, "b")).toDF("k", "ver", "v")
      .write.parquet(staging.toString)
    fs.create(new org.apache.hadoop.fs.Path(staging, CoreOps.CommitMarker), true).close()
    assert(fs.delete(target, true))
    // Next upsert must first finish the interrupted swap (recovering the
    // merged state), then apply its own batch on top — NOT treat the
    // table as fresh and drop history.
    CoreOps.upsert(Seq((3L, 1L, "c")).toDF("k", "ver", "v"), dir, "k", "ver")
    val got = spark.read.parquet(dir).as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, "merged"), (2L, 1L, "b"), (3L, 1L, "c")))
  }

  test("deleteWhere refuses a predicate that would empty the table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dw_all").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(dir)
    val ex = intercept[IllegalArgumentException] {
      CoreOps.deleteWhere(spark, dir, lit(true))
    }
    assert(ex.getMessage.contains("truncate"))
    // nothing was touched
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("upsert restores the renamed-aside table when staging is unusable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_up_old").toString + "/t"
    CoreOps.upsert(Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "ver", "v"),
      dir, "k", "ver")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // Simulate a crash right after the rename-aside with staging gone
    // bad (here: absent entirely): the only complete copy is `.old`,
    // and the next call must restore it verbatim before merging.
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".old")))
    CoreOps.upsert(Seq((3L, 1L, "c")).toDF("k", "ver", "v"), dir, "k", "ver")
    val got = spark.read.parquet(dir).as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".old")))
  }

  test("upsert recovery also accepts a legacy _SUCCESS-only staging dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_up_leg").toString + "/t"
    CoreOps.upsert(Seq((1L, 1L, "a")).toDF("k", "ver", "v"), dir, "k", "ver")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(dir + ".staging")
    // a pre-marker version's staging: _SUCCESS from the committer, no
    // _GRAFT_COMMIT — must still recover after the delete-crash window
    Seq((1L, 2L, "merged")).toDF("k", "ver", "v").write.parquet(staging.toString)
    assert(fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS")))
    assert(fs.delete(new org.apache.hadoop.fs.Path(dir), true))
    CoreOps.upsert(Seq((2L, 1L, "b")).toDF("k", "ver", "v"), dir, "k", "ver")
    val got = spark.read.parquet(dir).as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, "merged"), (2L, 1L, "b")))
  }

  test("upsert survives a crash between staging write and commit marker") {
    // Window: merged.write(staging) returned, process died BEFORE
    // fs.create(CommitMarker). State: target intact, staging complete
    // but UNMARKED. The abandoned merge must be discarded (it never
    // committed) and the next upsert must merge from the intact target —
    // zero loss of committed rows.
    val dir = java.nio.file.Files.createTempDirectory("graft_up_w1").toString + "/t"
    CoreOps.upsert(Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "ver", "v"),
      dir, "k", "ver")
    // the interrupted second upsert's staging: written by the same
    // overwrite-parquet path the operator uses, marker never created
    val staging = dir + ".staging"
    Seq((1L, 9L, "abandoned"), (2L, 1L, "b")).toDF("k", "ver", "v")
      .write.mode("overwrite").parquet(staging)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(staging, CoreOps.CommitMarker), false)
    CoreOps.upsert(Seq((3L, 1L, "c")).toDF("k", "ver", "v"), dir, "k", "ver")
    val got = spark.read.parquet(dir).as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c")),
      "committed rows must survive; the uncommitted merge must not surface")
  }

  test("upsert survives a crash between commit marker and target delete") {
    // Window: marker written, process died BEFORE fs.delete(target).
    // State: target intact AND a complete, marked staging. The target is
    // still the source of truth (the swap never started); recovery must
    // NOT fire — the next upsert merges from the target and overwrites
    // the abandoned staging.
    val dir = java.nio.file.Files.createTempDirectory("graft_up_w2").toString + "/t"
    CoreOps.upsert(Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "ver", "v"),
      dir, "k", "ver")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(dir + ".staging")
    Seq((1L, 9L, "abandoned"), (2L, 1L, "b")).toDF("k", "ver", "v")
      .write.mode("overwrite").parquet(staging.toString)
    fs.create(new org.apache.hadoop.fs.Path(staging, CoreOps.CommitMarker), true).close()
    CoreOps.upsert(Seq((3L, 1L, "c")).toDF("k", "ver", "v"), dir, "k", "ver")
    val got = spark.read.parquet(dir).as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c")))
    // the completed swap consumed staging — no stale dir left behind
    assert(!fs.exists(staging))
  }

  test("upsert fails loudly on missing target with incomplete staging") {
    val dir = java.nio.file.Files.createTempDirectory("graft_up_bad").toString + "/t"
    // An unmarked staging dir (no commit marker — e.g. a crash mid-write,
    // regardless of whether the committer wrote _SUCCESS) with no target
    // is unrecoverable — upsert must refuse, not silently start fresh.
    val f = new java.io.File(dir + ".staging")
    assert(f.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(f.toString, "part-00000.parquet"),
      Array[Byte](1, 2, 3))
    val err = intercept[IllegalArgumentException] {
      CoreOps.upsert(Seq((1L, 1L, "a")).toDF("k", "ver", "v"), dir, "k", "ver")
    }
    assert(err.getMessage.contains("incomplete"))
  }

  test("upsert winner is partitioning-independent for exact version ties") {
    val base = java.nio.file.Files.createTempDirectory("graft_up_tie").toString
    def winner(parts: Int): String = {
      val dir = s"$base/t$parts"
      CoreOps.upsert(Seq((1L, 0L, "seed")).toDF("k", "ver", "v"), dir, "k", "ver")
      // two rows, same key, same version: the row-hash tie-break must pick
      // the same one regardless of how the updates frame is partitioned
      CoreOps.upsert(Seq((1L, 1L, "x"), (1L, 1L, "y")).toDF("k", "ver", "v")
        .repartition(parts), dir, "k", "ver")
      spark.read.parquet(dir).select("v").as[String].head()
    }
    assert(winner(1) == winner(7))
  }

  test("refreshPartitions overwrites only the partitions present in the batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpo").toString + "/t"
    CoreOps.refreshPartitions(
      Seq(("2026-01-01", 1L, "a"), ("2026-01-02", 2L, "b")).toDF("day", "id", "v"),
      dir, "day")
    // re-land ONLY day 2; day 1 must survive untouched
    CoreOps.refreshPartitions(
      Seq(("2026-01-02", 9L, "b2")).toDF("day", "id", "v"), dir, "day")
    val got = spark.read.parquet(dir)
      .select("day", "id", "v").as[(String, Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(("2026-01-01", 1L, "a"), ("2026-01-02", 9L, "b2")))
    // the session's overwrite mode was restored (default = unset/static)
    assert(!spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      .contains("dynamic"))
  }

  test("compactWrite sizes file count to the byte target, not upstream partitioning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cw").toString
    // 200 input partitions of a small table would naively write 200 files
    val df = spark.range(20000).repartition(200)
      .select(col("id"), concat_ws("-", lit("pad"), col("id")).as("s"))
    def files(p: String): Int =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    // huge target -> one file regardless of the 200 upstream partitions
    val p1 = CoreOps.compactWrite(df, s"$dir/one", targetBytes = 1L << 40)
    assert(p1 == 1 && files(s"$dir/one") == 1)
    // small target -> several files, far fewer than 200
    val pN = CoreOps.compactWrite(df, s"$dir/some", targetBytes = 64 << 10)
    assert(pN > 1 && pN < 200)
    assert(files(s"$dir/some") == pN)
    // contents survive the reshuffle
    assert(spark.read.parquet(s"$dir/some").count() == 20000)
  }

  test("compactWrite keeps upstream partitioning when plan stats are the unknown sentinel") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cw_rdd").toString
    // LogicalRDD leaves report defaultSizeInBytes (unknown) — must NOT
    // explode to the 2^20 partition cap
    val rdd = spark.sparkContext.parallelize(1 to 10, 3).map(Row(_))
    val df = spark.createDataFrame(rdd, StructType(Seq(StructField("v", IntegerType))))
    val parts = CoreOps.compactWrite(df, s"$dir/t", targetBytes = 64)
    assert(parts == 3)
    assert(spark.read.parquet(s"$dir/t").count() == 10)
  }

  test("approx_count_distinct (HLL++) stays within 10% of exact counts") {
    // the error bound promised by q_approx_distinct's rows-only entry
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact).toDouble / exact <= 0.10,
        s"flag=${r.getString(0)} approx=$approx exact=$exact")
    }
  }

  test("dsum is exact (order-free) for 2-decimal money values") {
    val vals = Seq.tabulate(1000)(i => i + 0.01 * (i % 100))
    val got = vals.toDF("v").repartition(7)
      .agg(CoreOps.dsum(col("v")).as("s")).head().getDouble(0)
    val exact = vals.map(v => BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(got == exact.toDouble)
  }
}
