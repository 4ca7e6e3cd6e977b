package graft

import graft.operators.SummaryTables
import graft.plans.SummaryRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialized-view rewrite (plans.SummaryRewrite): the aggregate is
  * WRITTEN against the base orders table; these tests pin that the
  * optimizer re-plans it onto the stored summary (scan-level proof),
  * that results equal the unrewritten computation bit-for-bit, and
  * that every non-derivable shape aborts to the base table instead of
  * rewriting wrongly.
  */
class SummaryRewriteSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def scans(df: DataFrame): Seq[String] = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan.collectWithSubqueries {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.mkString(",")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  private def baseAgg() = Tables(spark, sfDir, "orders")
    .groupBy(col("o_orderpriority"))
    .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("mn"),
      max(col("o_totalprice")).as("mx"), sum(col("o_orderkey")).as("ks"))

  private def rows(df: DataFrame) =
    df.orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq

  test("registered aggregate re-plans onto the summary scan; results identical") {
    SummaryRewrite.clear()
    val unrewritten = rows(baseAgg()) // no spec registered: base plan
    val root = SummaryTables.ensure(spark, sfDir)
    try {
      val df = baseAgg()
      val locs = scans(df)
      assert(locs.exists(_.contains("graft_summary")), locs.mkString("\n"))
      assert(!locs.exists(_.contains("orders.parquet")), locs.mkString("\n"))
      assert(rows(df) == unrewritten)
      // full-key grouping (no rollup) also rewrites
      val full = Tables(spark, sfDir, "orders")
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      assert(scans(full).exists(_.contains("graft_summary")))
      assert(root.nonEmpty)
    } finally SummaryRewrite.clear()
  }

  test("non-derivable shapes abort to the base scan, never rewrite wrongly") {
    SummaryTables.ensure(spark, sfDir)
    try {
      def baseScan(df: DataFrame, base: String = "orders.parquet"): Unit = {
        val locs = scans(df)
        assert(locs.exists(_.contains(base)), locs.mkString("\n"))
        assert(!locs.exists(_.contains("graft_summary")), locs.mkString("\n"))
      }
      val o = Tables(spark, sfDir, "orders")
      // a filter the summary cannot answer
      baseScan(o.filter(col("o_totalprice") > 1000)
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n")))
      // avg is not derivable from the stored partials
      baseScan(o.groupBy(col("o_orderpriority"))
        .agg(avg(col("o_totalprice")).as("a")))
      // double sum: re-summing partials changes fp addition order
      baseScan(o.groupBy(col("o_orderpriority"))
        .agg(sum(col("o_totalprice")).as("s")))
      // grouping by a non-key column
      baseScan(o.groupBy(col("o_custkey")).agg(count(lit(1)).as("n")))
      // an unregistered table is never touched
      baseScan(Tables(spark, sfDir, "lineitem")
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")),
        base = "lineitem.parquet")
    } finally SummaryRewrite.clear()
  }

  test("spark.sql aggregates over a view of the base table rewrite too") {
    // the rule lives in the optimizer, so the SQL entry path gets the
    // same transparent rewrite as the DataFrame API — including through
    // a temp view (EliminateSubqueryAliases runs before the rule)
    SummaryTables.ensure(spark, sfDir)
    try {
      Tables(spark, sfDir, "orders").createOrReplaceTempView("mv_orders")
      val df = spark.sql("""
        SELECT o_orderstatus, count(*) AS n, max(o_totalprice) AS mx
        FROM mv_orders GROUP BY 1""")
      val locs = scans(df)
      assert(locs.exists(_.contains("graft_summary")), locs.mkString("\n"))
      assert(!locs.exists(_.contains("orders.parquet")), locs.mkString("\n"))
    } finally SummaryRewrite.clear()
  }

  test("maintain(): a base-table CDC feed updates the summary bit-equal to a rebuild") {
    import spark.implicits._
    val base0 = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L), (5L, "d", 1L))
      .toDF("id", "g", "v")
    // delete 2, update 3, insert 4, delete d's ONLY row (group vanishes)
    val base1 = Seq((1L, "a", 10L), (3L, "b", 7L), (4L, "c", 9L))
      .toDF("id", "g", "v")
    def rollup(b: org.apache.spark.sql.DataFrame) = b.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val path = java.nio.file.Files.createTempDirectory("mv_maint").toString + "/summary"
    rollup(base0).write.parquet(path)
    val feed = graft.ops.ChangeFeed.diff(base0, base1, Seq("id")).localCheckpoint()
    SummaryTables.maintain(path, feed, Seq("g"), "cnt", Map("v" -> "sum_v"))
    assert(rows(spark.read.parquet(path)) == rows(rollup(base1)))

    // insert-only feeds also maintain min/max partials exactly
    val base2 = base1.unionByName(Seq((6L, "a", 3L), (7L, "e", 8L)).toDF("id", "g", "v"))
    def rollupMm(b: org.apache.spark.sql.DataFrame) = b.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
    val path2 = java.nio.file.Files.createTempDirectory("mv_maint2").toString + "/summary"
    rollupMm(base1).write.parquet(path2)
    val insFeed = graft.ops.ChangeFeed.diff(base1, base2, Seq("id")).localCheckpoint()
    SummaryTables.maintain(path2, insFeed, Seq("g"), "cnt",
      Map("v" -> "sum_v"), Map("v" -> "min_v"), Map("v" -> "max_v"))
    def rowsMm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(rowsMm(spark.read.parquet(path2)) == rowsMm(rollupMm(base2)))

    // retractions + min/max partials: refused (not self-maintainable)
    assert(intercept[IllegalArgumentException] {
      SummaryTables.maintain(path2, feed, Seq("g"), "cnt",
        Map("v" -> "sum_v"), Map("v" -> "min_v"), Map("v" -> "max_v"))
    }.getMessage.contains("not self-maintainable"))
  }

  test("maintain(): non-null-count partials track count(x) exactly through deletes and null transitions") {
    import spark.implicits._
    // v nullable: group a has a null (cnt_v < cnt), group n all-null
    val base0 = Seq(
      (1L, "a", Option(10L)), (2L, "a", Option.empty[Long]),
      (3L, "b", Option(5L)), (4L, "n", Option.empty[Long]))
      .toDF("id", "g", "v")
    // delete a's null row (cnt_v unchanged, cnt -1), update b's only
    // value to null (cnt_v -1 — and the paired-count rule restores the
    // rebuild's NULL sum), insert a real value into n (cnt_v 0 -> 1),
    // insert a new group c
    val base1 = Seq(
      (1L, "a", Option(10L)), (3L, "b", Option.empty[Long]),
      (4L, "n", Option.empty[Long]), (5L, "n", Option(7L)),
      (6L, "c", Option(2L)))
      .toDF("id", "g", "v")
    def rollup(b: org.apache.spark.sql.DataFrame) = b.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"),
        count(col("v")).as("cnt_v"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val path = java.nio.file.Files.createTempDirectory("mv_cntv").toString + "/summary"
    rollup(base0).write.parquet(path)
    val feed = graft.ops.ChangeFeed.diff(base0, base1, Seq("id")).localCheckpoint()
    SummaryTables.maintain(path, feed, Seq("g"), "cnt",
      Map("v" -> "sum_v"), cntColsBase = Map("v" -> "cnt_v"))
    assert(rows(spark.read.parquet(path).select("g", "cnt", "sum_v", "cnt_v"))
      == rows(rollup(base1)))
  }

  test("batchId ledger: a replayed feed is a no-op; the ledger survives the swap") {
    import spark.implicits._
    val base0 = Seq((1L, "a", 10L), (2L, "b", 5L)).toDF("id", "g", "v")
    val base1 = Seq((1L, "a", 10L), (2L, "b", 6L), (3L, "a", 2L)).toDF("id", "g", "v")
    def rollup(b: org.apache.spark.sql.DataFrame) = b.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"))
    def rows(p: String) = spark.read.parquet(p).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val path = java.nio.file.Files.createTempDirectory("mv_ledger").toString + "/summary"
    rollup(base0).write.parquet(path)
    val feed = graft.ops.ChangeFeed.diff(base0, base1, Seq("id")).localCheckpoint()
    SummaryTables.maintain(path, feed, Seq("g"), "cnt", Map("v" -> "sum_v"),
      batchId = Some(7L))
    val want = rows(path)
    // replay of the SAME batch id: deltas are NOT re-applied
    SummaryTables.maintain(path, feed, Seq("g"), "cnt", Map("v" -> "sum_v"),
      batchId = Some(7L))
    assert(rows(path) == want)
    // a later ledgerless maintain still APPLIES (and must be correct)
    // while carrying the ledger forward, so the old id stays rejected
    val feed2 = graft.ops.ChangeFeed.diff(base1, base0, Seq("id")).localCheckpoint()
    SummaryTables.maintain(path, feed2, Seq("g"), "cnt", Map("v" -> "sum_v"))
    val back = rows(path)
    val want0 = rollup(base0).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(back == want0) // undone to base0's rollup
    SummaryTables.maintain(path, feed, Seq("g"), "cnt", Map("v" -> "sum_v"),
      batchId = Some(7L)) // still a no-op
    assert(rows(path) == back)
  }

  test("replay after a mid-swap crash does not double-apply (ledger read AFTER recovery)") {
    import spark.implicits._
    val base0 = Seq((1L, "a", 10L), (2L, "b", 5L)).toDF("id", "g", "v")
    val base1 = Seq((1L, "a", 10L), (2L, "b", 6L), (3L, "a", 2L)).toDF("id", "g", "v")
    def rollup(b: org.apache.spark.sql.DataFrame) = b.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"))
    def rows(p: String) = spark.read.parquet(p).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val dir = java.nio.file.Files.createTempDirectory("mv_crash").toString
    val path = s"$dir/summary"
    rollup(base0).write.parquet(path)
    val feed = graft.ops.ChangeFeed.diff(base0, base1, Seq("id")).localCheckpoint()
    SummaryTables.maintain(path, feed, Seq("g"), "cnt", Map("v" -> "sum_v"),
      batchId = Some(5L))
    val want = rows(path)
    // simulate the crash BETWEEN the swap's two renames: the applied
    // table (ledger included) sits as marked staging, the target is gone
    java.nio.file.Files.move(java.nio.file.Paths.get(path),
      java.nio.file.Paths.get(s"$path.staging"))
    // the streaming replay of batch 5 arrives: recovery must run before
    // the ledger read, or the already-applied deltas go on twice
    SummaryTables.maintain(path, feed, Seq("g"), "cnt", Map("v" -> "sum_v"),
      batchId = Some(5L))
    assert(rows(path) == want)
  }

  test("maintain(): NULL group keys merge as one group; NULL sums stay NULL") {
    import spark.implicits._
    // base0 has a NULL-keyed group (2 rows) and a group whose only value
    // is NULL (sum must be NULL, not 0)
    val base0 = Seq(
      (1L, Option("a"), Option(10L)), (2L, Option.empty[String], Option(5L)),
      (3L, Option.empty[String], Option(7L)), (4L, Option("n"), Option.empty[Long]))
      .toDF("id", "g", "v")
    // insert another NULL-keyed row, delete one, and give the null-sum
    // group a real value
    val base1 = Seq(
      (1L, Option("a"), Option(10L)), (3L, Option.empty[String], Option(7L)),
      (5L, Option.empty[String], Option(2L)), (4L, Option("n"), Option.empty[Long]),
      (6L, Option("n"), Option(9L)))
      .toDF("id", "g", "v")
    def rollup(b: org.apache.spark.sql.DataFrame) = b.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (if (r.isNullAt(0)) "<null>" else r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2)))
      .sortBy(_._1).toSeq
    val path = java.nio.file.Files.createTempDirectory("mv_null").toString + "/summary"
    rollup(base0).write.parquet(path)
    // sanity: the stored null-sum group really is NULL before the feed
    assert(rows(spark.read.parquet(path)).exists(r => r._1 == "n" && r._3 == Long.MinValue))
    val feed = graft.ops.ChangeFeed.diff(base0, base1, Seq("id")).localCheckpoint()
    SummaryTables.maintain(path, feed, Seq("g"), "cnt", Map("v" -> "sum_v"))
    assert(rows(spark.read.parquet(path)) == rows(rollup(base1)))
  }

  test("streaming maintainSummaryEachBatch: exactly-once IVM across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base0 = Seq((1L, "a", 10L), (2L, "b", 5L)).toDF("id", "g", "v")
    val base1 = Seq((1L, "a", 10L), (2L, "b", 6L), (3L, "a", 2L)).toDF("id", "g", "v")
    val base2 = Seq((2L, "b", 6L), (3L, "a", 2L), (4L, "c", 4L)).toDF("id", "g", "v")
    def rollup(b: org.apache.spark.sql.DataFrame) = b.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"),
        count(col("v")).as("cnt_v"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("g", "cnt", "sum_v", "cnt_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val path = java.nio.file.Files.createTempDirectory("mv_stream").toString + "/summary"
    rollup(base0).write.parquet(path)
    def feedRows(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      graft.ops.ChangeFeed.diff(a, b, Seq("id")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
    val mem = MemoryStream[(Long, String, String, Long)]
    val q = graft.streaming.StreamingOps.maintainSummaryEachBatch(
      mem.toDF().toDF("id", "change_type", "g", "v"),
      path, Seq("g"), "cnt", Map("v" -> "sum_v"),
      cntColsBase = Map("v" -> "cnt_v")).start()
    try {
      mem.addData(feedRows(base0, base1): _*)
      q.processAllAvailable()
      mem.addData(feedRows(base1, base2): _*)
      q.processAllAvailable()
      assert(rows(spark.read.parquet(path)) == rows(rollup(base2)))
    } finally q.stop()
  }

  test("streaming maintainSummaryEachBatch: a retraction batch repairs min/max from baseAfter") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the CDC pipeline shape: the feed is applied to the BASE table and
    // (via the same stream) to its min/max summary — the baseAfter
    // thunk re-reads the base path each micro-batch, so batch 2's
    // deletion of group a's minimum repairs min_v exactly
    val dir = java.nio.file.Files.createTempDirectory("mv_stream_retract").toString
    val base0 = Seq((1L, "a", 10L), (2L, "a", 3L), (3L, "b", 5L)).toDF("id", "g", "v")
    val base1 = Seq((1L, "a", 10L), (2L, "a", 3L), (3L, "b", 5L),
      (4L, "b", 1L)).toDF("id", "g", "v")
    val base2 = Seq((1L, "a", 10L), (3L, "b", 5L), (4L, "b", 1L))
      .toDF("id", "g", "v") // batch 2 DELETES (2, a, 3) — group a's min
    def rollup(b: org.apache.spark.sql.DataFrame) = b.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("g", "cnt", "sum_v", "min_v", "max_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1).toSeq
    val path = s"$dir/summary"
    rollup(base0).write.parquet(path)
    base0.write.mode("overwrite").parquet(s"$dir/base")
    def feedRows(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      graft.ops.ChangeFeed.diff(a, b, Seq("id")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
    val mem = MemoryStream[(Long, String, String, Long)]
    val q = graft.streaming.StreamingOps.maintainSummaryEachBatch(
      mem.toDF().toDF("id", "change_type", "g", "v"),
      path, Seq("g"), "cnt", Map("v" -> "sum_v"),
      minColsBase = Map("v" -> "min_v"), maxColsBase = Map("v" -> "max_v"),
      baseAfter = Some(() => spark.read.parquet(s"$dir/base"))).start()
    try {
      // batch 1: insert-only (no repair needed)
      base1.write.mode("overwrite").parquet(s"$dir/base")
      mem.addData(feedRows(base0, base1): _*)
      q.processAllAvailable()
      assert(rows(spark.read.parquet(path)) == rows(rollup(base1)))
      // batch 2: the retraction — min_v of group a must repair 3 → 10
      base2.write.mode("overwrite").parquet(s"$dir/base")
      mem.addData(feedRows(base1, base2): _*)
      q.processAllAvailable()
      assert(rows(spark.read.parquet(path)) == rows(rollup(base2)))
      assert(rows(spark.read.parquet(path)).find(_._1 == "a").get._4 == 10L)
    } finally q.stop()
  }

  test("avg rewrites to sum-partial/count-partial, bit-equal to the base plan") {
    SummaryRewrite.clear()
    def q() = Tables(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(avg(col("o_orderkey")).as("a"), count(col("o_orderkey")).as("nk"))
      .orderBy("o_orderstatus")
    // integer inputs whose running sums stay below 2^53: the base
    // plan's double accumulation is exact too, so bit-equality is a
    // real check of the derivation, not luck
    val base = q().collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    SummaryTables.ensure(spark, sfDir)
    try {
      val df = q()
      assert(scans(df).exists(_.contains("graft_summary")))
      assert(!scans(df).exists(_.contains("orders.parquet")))
      val got = df.collect().map(r =>
        (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(got == base)
    } finally SummaryRewrite.clear()
  }

  test("key-column filters apply to the summary; non-key filters still abort") {
    SummaryRewrite.clear()
    def q() = Tables(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F" && col("o_orderpriority") =!= "3-MEDIUM")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("mn"))
      .orderBy("o_orderpriority")
    val base = q().collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    SummaryTables.ensure(spark, sfDir)
    try {
      val df = q()
      val locs = scans(df)
      assert(locs.exists(_.contains("graft_summary")), locs.mkString("\n"))
      assert(!locs.exists(_.contains("orders.parquet")), locs.mkString("\n"))
      assert(q().collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq == base)
      // a filter mixing a key with a NON-key column aborts whole
      val mixed = Tables(spark, sfDir, "orders")
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 1000)
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(scans(mixed).exists(_.contains("orders.parquet")))
      assert(!scans(mixed).exists(_.contains("graft_summary")))
    } finally SummaryRewrite.clear()
  }

  test("star join rewrites onto summary ⋈ dim; unsound join shapes abort") {
    SummaryRewrite.clear()
    def q() = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("ks"),
        min(col("o_totalprice")).as("mn"), avg(col("o_orderkey")).as("a"))
      .orderBy("c_mktsegment")
    def rows(df: DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    val base = rows(q())
    SummaryTables.ensureCust(spark, sfDir)
    try {
      val df = q()
      val locs = scans(df)
      assert(locs.exists(_.contains("graft_summary_cust")), locs.mkString("\n"))
      assert(locs.exists(_.contains("customer.parquet")), locs.mkString("\n"))
      assert(!locs.exists(_.contains("orders.parquet")), locs.mkString("\n"))
      assert(rows(df) == base)

      val o = Tables(spark, sfDir, "orders")
      val c = Tables(spark, sfDir, "customer")
      def baseScan(df: DataFrame): Unit = {
        val l = scans(df)
        assert(l.exists(_.contains("orders.parquet")), l.mkString("\n"))
        assert(!l.exists(_.contains("graft_summary")), l.mkString("\n"))
      }
      // join touching the fact through a NON-key column aborts
      baseScan(o.join(c, col("o_orderkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n")))
      // dim-side aggregates abort: dim rows duplicate per-fact-row in
      // the base plan but per-group in the rewrite
      baseScan(o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(sum(col("c_acctbal")).as("s")))
      // outer joins abort: null-extended rows have no fact group
      baseScan(o.join(c, col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n")))
    } finally SummaryRewrite.clear()
  }

  test("ROLLUP/CUBE re-expand the summary; non-key grouping-sets abort") {
    SummaryRewrite.clear()
    def q() = Tables(spark, sfDir, "orders")
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("ks"),
        min(col("o_totalprice")).as("mn"), avg(col("o_orderkey")).as("a"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("o_orderpriority"), col("o_orderstatus"))
    def rows(df: DataFrame) = df.collect().map(r =>
      (Option(r.get(0)), Option(r.get(1)), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))).toSeq
    val base = rows(q())
    SummaryTables.ensure(spark, sfDir)
    try {
      val df = q()
      val locs = scans(df)
      assert(locs.exists(_.contains("graft_summary")), locs.mkString("\n"))
      assert(!locs.exists(_.contains("orders.parquet")), locs.mkString("\n"))
      assert(rows(df) == base)
      // CUBE goes through the same Expand machinery
      val cube = Tables(spark, sfDir, "orders")
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      assert(scans(cube).exists(_.contains("graft_summary")))
      // explicit GROUPING SETS with an asymmetric pattern too
      Tables(spark, sfDir, "orders").createOrReplaceTempView("mv_gsets_orders")
      val gs = spark.sql("""
        SELECT o_orderstatus, count(*) AS n FROM mv_gsets_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderstatus), ())""")
      assert(scans(gs).exists(_.contains("graft_summary")))
      assert(!scans(gs).exists(_.contains("orders.parquet")))
      // rolling up a NON-key column aborts to the base scan
      val bad = Tables(spark, sfDir, "orders")
        .rollup(col("o_orderpriority"), col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      assert(scans(bad).exists(_.contains("orders.parquet")))
      assert(!scans(bad).exists(_.contains("graft_summary")))
    } finally SummaryRewrite.clear()
  }

  test("sum-of-expression partials: the cents idiom rewrites; unregistered expressions abort") {
    SummaryRewrite.clear()
    val cents = expr(SummaryTables.CentsExprSql)
    def q() = Tables(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(sum(cents).as("tc"), count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
    def rows(df: DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val base = rows(q())
    SummaryTables.ensure(spark, sfDir)
    try {
      val df = q()
      val locs = scans(df)
      assert(locs.exists(_.contains("graft_summary")), locs.mkString("\n"))
      assert(!locs.exists(_.contains("orders.parquet")), locs.mkString("\n"))
      assert(rows(df) == base)
      // an expression NOT registered as a partial aborts to the base
      val other = Tables(spark, sfDir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("o_orderkey") * 2).as("x"))
      assert(scans(other).exists(_.contains("orders.parquet")))
      assert(!scans(other).exists(_.contains("graft_summary")))
    } finally SummaryRewrite.clear()
  }

  test("multi-hop star: the fact deep in a left-deep chain rewrites through both joins") {
    SummaryRewrite.clear()
    def q() = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("ks"),
        avg(col("o_orderkey")).as("a"))
      .orderBy("n_name")
    def rows(df: DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val base = rows(q())
    SummaryTables.ensureCust(spark, sfDir)
    try {
      val df = q()
      val locs = scans(df)
      assert(locs.exists(_.contains("graft_summary_cust")), locs.mkString("\n"))
      assert(locs.exists(_.contains("customer.parquet")), locs.mkString("\n"))
      assert(locs.exists(_.contains("nation.parquet")), locs.mkString("\n"))
      assert(!locs.exists(_.contains("orders.parquet")), locs.mkString("\n"))
      assert(rows(df) == base)
      // a second-hop condition touching the FACT through a non-key
      // aborts the whole chain
      val bad = Tables(spark, sfDir, "orders")
        .join(Tables(spark, sfDir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(Tables(spark, sfDir, "nation"),
          col("n_nationkey") === col("o_orderkey") % 25)
        .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      val badLocs = scans(bad)
      assert(badLocs.exists(_.contains("orders.parquet")), badLocs.mkString("\n"))
      assert(!badLocs.exists(_.contains("graft_summary")), badLocs.mkString("\n"))
    } finally SummaryRewrite.clear()
  }

  test("non-equi join ON the key also rewrites (fact-key-only predicate is the sound guard)") {
    SummaryRewrite.clear()
    // every fact row of a custkey group shares the <' outcome, so the
    // pushdown identity holds for ANY deterministic fact-key-only
    // predicate — wider than the equi-FK shape, pinned here
    def q() = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"),
        col("o_custkey") < col("c_custkey") && col("c_custkey") <= 10L)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("ks"))
      .orderBy("c_mktsegment")
    def rows(df: DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val base = rows(q())
    SummaryTables.ensureCust(spark, sfDir)
    try {
      val df = q()
      val locs = scans(df)
      assert(locs.exists(_.contains("graft_summary_cust")), locs.mkString("\n"))
      assert(!locs.exists(_.contains("orders.parquet")), locs.mkString("\n"))
      assert(rows(df) == base)
    } finally SummaryRewrite.clear()
  }

  test("re-registration with the same keys evicts the stale summary (freshness)") {
    import spark.implicits._
    SummaryRewrite.clear()
    val dir = java.nio.file.Files.createTempDirectory("mv_fresh").toString
    Seq((1L, "a", 2L), (2L, "a", 3L), (3L, "b", 5L)).toDF("k", "g", "v")
      .write.parquet(s"$dir/base")
    def rollupTo(path: String): Unit =
      spark.read.parquet(s"$dir/base").groupBy("g")
        .agg(count(lit(1)).as("cnt")).write.parquet(path)
    rollupTo(s"$dir/sum_tag1")
    try {
      def spec(p: String) =
        SummaryRewrite.SummarySpec(p, Seq("g"), "cnt")
      SummaryRewrite.register(s"$dir/base", spec(s"$dir/sum_tag1"))
      // the corpus "changes" (same bytes here — the point is the spec
      // eviction): a NEW content tag registers a NEW summary path with
      // the SAME key set — the stale spec must not stay first in
      // candidate order and keep serving old bytes
      rollupTo(s"$dir/sum_tag2")
      SummaryRewrite.register(s"$dir/base", spec(s"$dir/sum_tag2"))
      val df = spark.read.parquet(s"$dir/base")
        .groupBy(col("g")).agg(count(lit(1)).as("n"))
      val locs = scans(df)
      assert(locs.exists(_.contains("sum_tag2")), locs.mkString("\n"))
      assert(!locs.exists(_.contains("sum_tag1")), locs.mkString("\n"))
    } finally SummaryRewrite.clear()
  }

  test("maintain(): a delete feed repairs min/max from baseAfter, bit-equal to a rebuild") {
    import graft.operators.SummaryTables
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mv_retract").toString
    val rows0 = Seq((1L, "a", 5.0), (2L, "a", 1.0), (3L, "a", 9.0),
      (4L, "b", 2.0), (5L, "b", 7.0), (7L, "d", 3.0))
    def rollup(b: org.apache.spark.sql.DataFrame) = b.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
    rollup(rows0.toDF("k", "g", "v")).write.parquet(s"$dir/sum")
    // delete group a's MINIMUM and group b's MAXIMUM (the two
    // non-self-maintainable directions), delete group d entirely, and
    // insert a brand-new group c in the same batch
    val feed = Seq(
      ("delete", 2L, "a", 1.0), ("delete", 5L, "b", 7.0),
      ("delete", 7L, "d", 3.0), ("insert", 6L, "c", 4.0))
      .toDF("change_type", "k", "g", "v")
    val after = Seq((1L, "a", 5.0), (3L, "a", 9.0), (4L, "b", 2.0),
      (6L, "c", 4.0)).toDF("k", "g", "v")
    // without baseAfter the old refusal still stands
    val e = intercept[IllegalArgumentException] {
      SummaryTables.maintain(s"$dir/sum", feed, Seq("g"), "cnt",
        Map("k" -> "sum_k"), Map("v" -> "min_v"), Map("v" -> "max_v"))
    }
    assert(e.getMessage.contains("baseAfter"))
    SummaryTables.maintain(s"$dir/sum", feed, Seq("g"), "cnt",
      Map("k" -> "sum_k"), Map("v" -> "min_v"), Map("v" -> "max_v"),
      baseAfter = Some(after))
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val maintained = rows(spark.read.parquet(s"$dir/sum")
      .select("g", "cnt", "sum_k", "min_v", "max_v"))
    val rebuilt = rows(rollup(after).select("g", "cnt", "sum_k", "min_v", "max_v"))
    assert(maintained == rebuilt,
      s"maintained $maintained != rebuilt $rebuilt")
    // group a min repaired to 5.0 (not stuck at the deleted 1.0), b max
    // to 2.0, d gone, c born
    assert(maintained.map(_._1) == Seq("a", "b", "c"))
    assert(maintained.find(_._1 == "a").get._4 == 5.0)
    assert(maintained.find(_._1 == "b").get._5 == 2.0)
  }

  test("maintain(): a summary with partials this call cannot maintain is refused, fast") {
    import graft.operators.SummaryTables
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mv_drift").toString
    Seq((1L, "a", 2.0)).toDF("k", "g", "v").groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
        sum(expr("CAST(v * 100 AS BIGINT)")).as("sum_cents"))
      .write.parquet(s"$dir/sum")
    val feed = Seq(("insert", 2L, "a", 3.0))
      .toDF("change_type", "k", "g", "v")
    // sum_cents is an expression partial no feed column maintains:
    // silently rewriting the summary WITHOUT it would only surface
    // later as a register() schema failure — fail here, naming it
    val e = intercept[IllegalArgumentException] {
      SummaryTables.maintain(s"$dir/sum", feed, Seq("g"), "cnt",
        Map("k" -> "sum_k"))
    }
    assert(e.getMessage.contains("sum_cents"), e.getMessage)
  }

  test("TRY-mode aggregates abort to the base scan (overflow-to-NULL is not derivable)") {
    SummaryRewrite.clear()
    SummaryTables.ensure(spark, sfDir)
    try {
      // try_sum yields NULL where a partial re-sum would yield a value
      // (or an ANSI error) — the rewrite must leave it on the base
      val trySum = Tables(spark, sfDir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(expr("try_sum(o_orderkey)").as("ks"))
      val locs = scans(trySum)
      assert(locs.exists(_.contains("orders.parquet")), locs.mkString("\n"))
      assert(!locs.exists(_.contains("graft_summary")), locs.mkString("\n"))
      val tryAvg = Tables(spark, sfDir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(expr("try_avg(o_orderkey)").as("ak"))
      val locs2 = scans(tryAvg)
      assert(locs2.exists(_.contains("orders.parquet")), locs2.mkString("\n"))
      // the SAME aggregates in default mode still rewrite (the abort is
      // the TRY mode, not a regression of sum/avg derivation)
      val plain = Tables(spark, sfDir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("o_orderkey")).as("ks"), avg(col("o_orderkey")).as("ak"))
      assert(scans(plain).exists(_.contains("graft_summary")))
    } finally SummaryRewrite.clear()
  }

  test("cost-based selection: the cheapest derivable summary wins regardless of registration order") {
    import spark.implicits._
    SummaryRewrite.clear()
    val dir = java.nio.file.Files.createTempDirectory("mv_cost").toString
    // base with 2 g-values x 100 h-values: the (g) rollup is 2 rows,
    // the (g, h) rollup 200 — both can answer GROUP BY g, and the
    // smaller must win whatever order they registered in
    (0 until 1000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b",
        (i % 100).toLong))
      .toDF("k", "g", "h").write.parquet(s"$dir/base")
    val base = spark.read.parquet(s"$dir/base")
    base.groupBy("g").agg(count(lit(1)).as("cnt"))
      .write.parquet(s"$dir/sum_coarse")
    base.groupBy("g", "h").agg(count(lit(1)).as("cnt"))
      .write.parquet(s"$dir/sum_fine")
    val coarse = SummaryRewrite.SummarySpec(s"$dir/sum_coarse", Seq("g"), "cnt")
    val fine = SummaryRewrite.SummarySpec(s"$dir/sum_fine", Seq("g", "h"), "cnt")
    def q() = spark.read.parquet(s"$dir/base")
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
    val expected = q().collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    for (order <- Seq(Seq(coarse, fine), Seq(fine, coarse))) {
      SummaryRewrite.clear()
      order.foreach(s => SummaryRewrite.register(s"$dir/base", s))
      val locs = scans(q())
      assert(locs.exists(_.contains("sum_coarse")), locs.mkString("\n"))
      assert(!locs.exists(_.contains("sum_fine")), locs.mkString("\n"))
      assert(q().collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
        == expected)
      // a query only the FINE summary can answer still rewrites (cost
      // order must not hide the derivable candidate behind an abort)
      val fineOnly = spark.read.parquet(s"$dir/base")
        .groupBy(col("g"), col("h")).agg(count(lit(1)).as("n"))
      assert(scans(fineOnly).exists(_.contains("sum_fine")))
    }
    SummaryRewrite.clear()
  }

  test("count(DISTINCT key) derives from the summary; count(DISTINCT non-key) aborts") {
    SummaryRewrite.clear()
    def q() = Tables(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_orderstatus")).as("n_status"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val unrewritten = rows(q())
    SummaryTables.ensure(spark, sfDir)
    try {
      val df = q()
      val locs = scans(df)
      assert(locs.exists(_.contains("graft_summary")), locs.mkString("\n"))
      assert(!locs.exists(_.contains("orders.parquet")), locs.mkString("\n"))
      assert(rows(df) == unrewritten)
      // count(DISTINCT non-key) collapsed inside the summary groups —
      // must abort to the base scan, never estimate from partials
      val nonKey = Tables(spark, sfDir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"))
      val locsNk = scans(nonKey)
      assert(locsNk.exists(_.contains("orders.parquet")), locsNk.mkString("\n"))
    } finally SummaryRewrite.clear()
  }

  test("a non-file V1 relation never matches nor crashes the rule") {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    SummaryTables.ensure(spark, sfDir) // at least one spec registered
    try {
      // a V1 BaseRelation that is NOT a HadoopFsRelation (the JDBC
      // shape) — rootKey is None; the rule must skip it, not NPE the
      // optimizer through a null map key
      val rel = new org.apache.spark.sql.sources.BaseRelation {
        override def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext
        override def schema: org.apache.spark.sql.types.StructType =
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("x",
              org.apache.spark.sql.types.LongType)))
      }
      val lr = LogicalRelation(rel, isStreaming = false)
      val agg = Aggregate(Nil, Seq(Alias(AggregateExpression(
        Count(Seq(Literal(1))), Complete, isDistinct = false), "n")()), lr)
      assert(SummaryRewrite.apply(agg) eq agg)
    } finally SummaryRewrite.clear()
  }

  test("a bare column registered only as a sum EXPRESSION still rewrites (fallthrough)") {
    import spark.implicits._
    SummaryRewrite.clear()
    val dir = java.nio.file.Files.createTempDirectory("mv_bare").toString
    Seq((1L, "a", 2L), (2L, "a", 3L), (3L, "b", 5L)).toDF("k", "g", "v")
      .write.parquet(s"$dir/base")
    spark.read.parquet(s"$dir/base").groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"))
      .write.parquet(s"$dir/sum")
    try {
      // sumExprs only — no sumCols entry: sum(v) must fall through the
      // bare-column case to the expression match, not silently abort
      SummaryRewrite.register(s"$dir/base", SummaryRewrite.SummarySpec(
        s"$dir/sum", Seq("g"), "cnt", sumExprs = Map("v" -> "sum_v")))
      val df = spark.read.parquet(s"$dir/base")
        .groupBy(col("g")).agg(sum(col("v")).as("s"))
      val locs = scans(df)
      assert(locs.exists(_.contains("sum")), locs.mkString("\n"))
      assert(!locs.exists(_.endsWith("base")), locs.mkString("\n"))
      assert(df.orderBy("g").collect().map(r => (r.getString(0), r.getLong(1)))
        .toSeq == Seq(("a", 5L), ("b", 5L)))
    } finally SummaryRewrite.clear()
  }

  test("non-integral sum partials are refused at register (the abort contract, enforced)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mv_int").toString
    Seq((1L, "a", 2.5)).toDF("k", "g", "d").write.parquet(s"$dir/base")
    Seq(("a", 1L, 2.5)).toDF("g", "cnt", "sum_d").write.parquet(s"$dir/sum")
    // a double sum partial would PASS the rewrite's dataType gate
    // (Sum(double) == double) yet change fp addition order — refused
    // at registration with the reason
    val e1 = intercept[IllegalArgumentException] {
      SummaryRewrite.register(s"$dir/base", SummaryRewrite.SummarySpec(
        s"$dir/sum", Seq("g"), "cnt", sumCols = Map("d" -> "sum_d")))
    }
    assert(e1.getMessage.contains("INTEGRAL"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      SummaryRewrite.register(s"$dir/base", SummaryRewrite.SummarySpec(
        s"$dir/sum", Seq("g"), "cnt",
        sumExprs = Map("d * 2.0" -> "sum_d")))
    }
    assert(e2.getMessage.contains("INTEGRAL"), e2.getMessage)
    SummaryRewrite.clear()
  }

  test("a new base content tag evicts EVERY key set's summary (cross-fixture freshness)") {
    import spark.implicits._
    SummaryRewrite.clear()
    val dir = java.nio.file.Files.createTempDirectory("mv_tag").toString
    Seq((1L, "a", 2L), (2L, "b", 3L)).toDF("k", "g", "v")
      .write.parquet(s"$dir/base")
    def rollupTo(cols: String, path: String): Unit =
      spark.read.parquet(s"$dir/base").groupBy(cols)
        .agg(count(lit(1)).as("cnt")).write.parquet(path)
    rollupTo("g", s"$dir/sum_g_t1")
    rollupTo("k", s"$dir/sum_k_t1")
    try {
      def spec(p: String, key: String, tag: String) =
        SummaryRewrite.SummarySpec(p, Seq(key), "cnt", baseTag = tag)
      SummaryRewrite.register(s"$dir/base", spec(s"$dir/sum_g_t1", "g", "t1"))
      SummaryRewrite.register(s"$dir/base", spec(s"$dir/sum_k_t1", "k", "t1"))
      // the corpus "changes": tag t2 re-registers only the g-keyed
      // fixture — the k-keyed t1 spec must NOT survive to serve stale
      // bytes from candidate position 0
      rollupTo("g", s"$dir/sum_g_t2")
      SummaryRewrite.register(s"$dir/base", spec(s"$dir/sum_g_t2", "g", "t2"))
      val gq = spark.read.parquet(s"$dir/base")
        .groupBy(col("g")).agg(count(lit(1)).as("n"))
      assert(scans(gq).exists(_.contains("sum_g_t2")))
      val kq = spark.read.parquet(s"$dir/base")
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
      val kLocs = scans(kq)
      assert(!kLocs.exists(_.contains("sum_k_t1")), kLocs.mkString("\n"))
      assert(kLocs.exists(_.contains("base")), kLocs.mkString("\n"))
    } finally SummaryRewrite.clear()
  }

  test("register() fails fast on a mis-registered spec (no optimizer-time crash)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mv_reg").toString
    Seq((1L, "a", 2L)).toDF("k", "g", "v").write.parquet(s"$dir/base")
    Seq(("a", 1L, 2L)).toDF("g", "cnt", "sum_v").write.parquet(s"$dir/sum")
    // a partial column that does not exist in the summary schema
    val e1 = intercept[IllegalArgumentException] {
      SummaryRewrite.register(s"$dir/base", SummaryRewrite.SummarySpec(
        s"$dir/sum", Seq("g"), "cnt", sumCols = Map("v" -> "nope")))
    }
    assert(e1.getMessage.contains("nope") &&
      e1.getMessage.contains("summary schema"), e1.getMessage)
    // a key that does not exist in the base schema
    val e2 = intercept[IllegalArgumentException] {
      SummaryRewrite.register(s"$dir/base", SummaryRewrite.SummarySpec(
        s"$dir/sum", Seq("missing"), "cnt"))
    }
    assert(e2.getMessage.contains("missing"), e2.getMessage)
    SummaryRewrite.clear()
  }

  test("maintain(): unpaired update_postimage rows are refused with min/max partials") {
    import spark.implicits._
    val base = Seq((1L, "a", 10L)).toDF("id", "g", "v")
    def rollupMm(b: DataFrame) = b.groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
    val path = java.nio.file.Files.createTempDirectory("mv_post").toString + "/summary"
    rollupMm(base).write.parquet(path)
    // a malformed feed: postimage with no preimage twin — must fail
    // loudly, not silently double-count into the partials
    val feed = Seq((1L, "update_postimage", "a", 99L))
      .toDF("id", "change_type", "g", "v")
    assert(intercept[IllegalArgumentException] {
      SummaryTables.maintain(path, feed, Seq("g"), "cnt",
        Map("v" -> "sum_v"), Map("v" -> "min_v"), Map("v" -> "max_v"))
    }.getMessage.contains("not self-maintainable"))
  }

  test("rewritten LongType sum and count equal the base computation exactly") {
    SummaryRewrite.clear()
    val base = Tables(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("o_orderkey")).as("ks"), count(lit(1)).as("n"))
      .orderBy("o_orderstatus").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    SummaryTables.ensure(spark, sfDir)
    try {
      val df = Tables(spark, sfDir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("o_orderkey")).as("ks"), count(lit(1)).as("n"))
      assert(scans(df).exists(_.contains("graft_summary")))
      val got = df.orderBy("o_orderstatus").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == base)
    } finally SummaryRewrite.clear()
  }

  test("summary-over-summary: the coarse rollup wins by cost and equals the base") {
    SummaryRewrite.clear()
    def q() = Tables(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("mn"),
        sum(col("o_orderkey")).as("ks"), avg(col("o_orderkey")).as("av"),
        sum(expr(SummaryTables.CentsExprSql)).as("cents"))
    def rows(df: DataFrame) = df.orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSeq
    val unrewritten = rows(q())
    SummaryTables.ensureCoarse(spark, sfDir) // registers fine + coarse
    try {
      val df = q()
      val locs = scans(df)
      // the COARSE summary (smaller stored bytes) wins candidate order;
      // neither the finer summary nor the base is scanned
      assert(locs.exists(_.contains("graft_summary_coarse")), locs.mkString("\n"))
      assert(!locs.exists(_.contains("graft_summary/")), locs.mkString("\n"))
      assert(!locs.exists(_.contains("orders.parquet")), locs.mkString("\n"))
      assert(rows(df) == unrewritten)
      // a (priority, status) grouping is NOT derivable from the coarse
      // summary — the finer one still serves it
      val fine = Tables(spark, sfDir, "orders")
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      assert(scans(fine).exists(_.contains("graft_summary/")),
        scans(fine).mkString("\n"))
    } finally SummaryRewrite.clear()
  }

  test("deriveCoarse: generic partial rollup serves a different coarse axis exactly") {
    SummaryRewrite.clear()
    def q() = Tables(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("mx"),
        sum(col("o_orderkey")).as("ks"), avg(col("o_orderkey")).as("av"),
        sum(expr(SummaryTables.CentsExprSql)).as("cents"))
    def rows(df: DataFrame) = df.orderBy("o_orderstatus").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSeq
    val unrewritten = rows(q())
    // the fixture derives (priority); here the GENERIC API rolls the
    // same finer summary up the OTHER axis, (status)
    val fineRoot = SummaryTables.ensure(spark, sfDir)
    val out = java.nio.file.Files
      .createTempDirectory("graft_coarse_status").toString + "/s"
    try {
      val fine = SummaryRewrite.SummarySpec(
        summaryPath = fineRoot,
        keys = Seq("o_orderpriority", "o_orderstatus"), countCol = "cnt",
        minCols = Map("o_totalprice" -> "min_price"),
        maxCols = Map("o_totalprice" -> "max_price"),
        sumCols = Map("o_orderkey" -> "sum_okey"),
        cntCols = Map("o_orderkey" -> "cnt_okey"),
        sumExprs = Map(SummaryTables.CentsExprSql -> "sum_cents"))
      val coarse = SummaryTables.deriveCoarse(
        spark, fine, Seq("o_orderstatus"), out)
      assert(coarse.keys == Seq("o_orderstatus") &&
        coarse.summaryPath == out)
      SummaryRewrite.register(s"$sfDir/orders.parquet", coarse)
      val df = q()
      val locs = scans(df)
      assert(locs.exists(_.contains(out)), locs.mkString("\n"))
      assert(!locs.exists(_.contains("orders.parquet")), locs.mkString("\n"))
      assert(rows(df) == unrewritten)
      // a non-subset coarse key fails fast
      intercept[IllegalArgumentException] {
        SummaryTables.deriveCoarse(spark, fine, Seq("o_custkey"), out + "2")
      }
    } finally SummaryRewrite.clear()
  }

  test("UNION ALL fact shape: branch-per-branch rewrite, partial coverage aborts") {
    SummaryRewrite.clear()
    val (coldP, hotP) = SummaryTables.ensureSplit(spark, sfDir)
    def q() = spark.read.parquet(coldP).union(spark.read.parquet(hotP))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("mn"),
        max(col("o_totalprice")).as("mx"), sum(col("o_orderkey")).as("ks"),
        avg(col("o_orderkey")).as("av"))
    def rows(df: DataFrame) = df.orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5))).toSeq
    try {
      val df = q()
      val locs = scans(df)
      assert(locs.exists(_.contains("summary_cold")), locs.mkString("\n"))
      assert(locs.exists(_.contains("summary_hot")), locs.mkString("\n"))
      assert(!locs.exists(_.contains("cold.parquet")), locs.mkString("\n"))
      assert(!locs.exists(_.contains("hot.parquet")), locs.mkString("\n"))
      // the union of the split IS orders: the rewrite must equal the
      // base-table aggregate computed with no registrations at all
      SummaryRewrite.clear()
      val unrewritten = rows(Tables(spark, sfDir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("mn"),
          max(col("o_totalprice")).as("mx"), sum(col("o_orderkey")).as("ks"),
          avg(col("o_orderkey")).as("av")))
      SummaryTables.ensureSplit(spark, sfDir)
      assert(rows(df) == unrewritten)
      // the spark.sql spelling over temp views of the split paths
      // rewrites identically (alias elimination runs before the rule)
      spark.read.parquet(coldP).createOrReplaceTempView("mvu_cold")
      spark.read.parquet(hotP).createOrReplaceTempView("mvu_hot")
      val sqlDf = spark.sql("""
        SELECT o_orderpriority, count(*) AS n
        FROM (SELECT * FROM mvu_cold UNION ALL SELECT * FROM mvu_hot)
        GROUP BY o_orderpriority""")
      assert(scans(sqlDf).exists(_.contains("summary_cold")) &&
        !scans(sqlDf).exists(_.contains("cold.parquet")),
        scans(sqlDf).mkString("\n"))
      // per-branch KEY filter remaps branch-locally and still rewrites
      val filtered = spark.read.parquet(coldP)
        .filter(col("o_orderstatus") === "F")
        .union(spark.read.parquet(hotP)
          .filter(col("o_orderstatus") === "F"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(scans(filtered).exists(_.contains("summary_cold")),
        scans(filtered).mkString("\n"))
      assert(!scans(filtered).exists(_.contains("cold.parquet")),
        scans(filtered).mkString("\n"))
      // PARTIAL coverage aborts: with only the cold branch registered,
      // the whole aggregate runs against the base union (no
      // half-rewrite mixing summary rows with fact rows)
      SummaryRewrite.clear()
      SummaryRewrite.register(coldP, SummaryRewrite.SummarySpec(
        summaryPath = s"${new java.io.File(coldP).getParent}/summary_cold",
        keys = Seq("o_orderpriority", "o_orderstatus"), countCol = "cnt",
        minCols = Map("o_totalprice" -> "min_price"),
        maxCols = Map("o_totalprice" -> "max_price"),
        sumCols = Map("o_orderkey" -> "sum_okey"),
        cntCols = Map("o_orderkey" -> "cnt_okey")))
      val partial = q()
      val plocs = scans(partial)
      assert(plocs.exists(_.contains("hot.parquet")), plocs.mkString("\n"))
      assert(plocs.exists(_.contains("cold.parquet")), plocs.mkString("\n"))
      assert(!plocs.exists(_.contains("summary_")), plocs.mkString("\n"))
      assert(rows(partial) == unrewritten)
    } finally SummaryRewrite.clear()
  }
}
