package graft

import graft.ops.ChangeFeed
import graft.sources.StagedSink
import org.apache.spark.sql.functions._

/** CDC diff semantics (ops.ChangeFeed): the Debezium/Delta-CDF row
  * model over two snapshots, null-safe value comparison, the plan's
  * one-join shape, and the composition with StagedSink's retained
  * generation (a change feed with zero extra write amplification).
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "change_type", "v").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("insert/delete/update rows; unchanged keys emit nothing") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val cur = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("k", "v")
    val out = rows(ChangeFeed.diff(prev, cur, Seq("k")))
    assert(out == Seq(
      (1L, "delete", "a"),
      (3L, "update_postimage", "C"),
      (3L, "update_preimage", "c"),
      (4L, "insert", "d")))
  }

  test("null values compare null-safely: null==null unchanged, null->x update") {
    val prev = Seq((1L, null: String), (2L, null: String), (3L, "x"))
      .toDF("k", "v")
    val cur = Seq((1L, null: String), (2L, "y"), (3L, null: String))
      .toDF("k", "v")
    val out = rows(ChangeFeed.diff(prev, cur, Seq("k")))
    assert(out == Seq(
      (2L, "update_postimage", "y"),
      (2L, "update_preimage", null),
      (3L, "update_postimage", null),
      (3L, "update_preimage", "x")))
  }

  test("schema mismatch and key-only schemas are rejected loudly") {
    val a = Seq((1L, "a")).toDF("k", "v")
    val b = Seq((1L, "a")).toDF("k", "w")
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.diff(a, b, Seq("k"))
    }.getMessage.contains("schemas differ"))
    val keysOnly = Seq(Tuple1(1L)).toDF("k")
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.diff(keysOnly, keysOnly, Seq("k"))
    }.getMessage.contains("no value columns"))
  }

  test("schema drift: added/removed columns null-fill and count as value changes") {
    // prev has (k, v, old); cur DROPPED old and ADDED nu
    val prev = Seq((1L, "a", "x"), (2L, "b", null: String), (3L, "c", "z"))
      .toDF("k", "v", "old")
    val cur = Seq((2L, "b", null: String), (3L, "c", "N"), (4L, "d", "M"))
      .toDF("k", "v", "nu")
    val out = ChangeFeed.diff(prev, cur, Seq("k"), allowSchemaDrift = true)
    // union schema, prev's columns first then cur's additions
    assert(out.columns.toSeq == Seq("k", "change_type", "v", "old", "nu"))
    def g(r: org.apache.spark.sql.Row, i: Int) =
      if (r.isNullAt(i)) null else r.getString(i)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getString(1), g(r, 2), g(r, 3), g(r, 4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      (1L, "delete", "a", "x", null),
      // key 2: old was null in prev AND nu is null in cur — after
      // null-fill the rows are identical, so NOTHING is emitted
      // key 3: old was populated in prev (a real materialized change)
      (3L, "update_postimage", "c", null, "N"),
      (3L, "update_preimage", "c", "z", null),
      (4L, "insert", "d", null, "M")), got.mkString(" | "))

    // drifted apply closes the round trip on the union schema
    val applied = ChangeFeed.applyFeed(prev,
        ChangeFeed.diff(prev, cur, Seq("k"), allowSchemaDrift = true),
        Seq("k"), allowSchemaDrift = true)
      .collect()
      .map(r => (r.getLong(0), g(r, 1), g(r, 2), g(r, 3)))
      .sortBy(_._1).toSeq
    // = cur aligned to the union schema (old null-filled)... EXCEPT
    // key 2, untouched by the feed, which keeps its stored old=null —
    // here equal to the null-fill, so the equality is exact
    assert(applied == Seq(
      (2L, "b", null, null), (3L, "c", null, "N"), (4L, "d", null, "M")),
      applied.mkString(" | "))

    // a key column missing on one side cannot be null-filled
    val noKey = Seq(("a", "x")).toDF("v", "old")
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.diff(prev, noKey, Seq("k"), allowSchemaDrift = true)
    }.getMessage.contains("cannot be null-filled"))
    // a shared column changing TYPE is drift the null-fill cannot cover
    val retyped = Seq((1L, 7L, "x")).toDF("k", "v", "old")
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.diff(prev, retyped, Seq("k"), allowSchemaDrift = true)
    }.getMessage.contains("changed data type"))
    // strict mode still refuses drifted schemas (opt-in only)
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.diff(prev, cur, Seq("k"))
    }.getMessage.contains("schemas differ"))
    // apply aborts when the state has a column the feed never saw
    val wide = Seq((1L, "a", "x", 1L)).toDF("k", "v", "old", "extra")
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.applyFeed(wide,
        ChangeFeed.diff(prev, cur, Seq("k"), allowSchemaDrift = true),
        Seq("k"), allowSchemaDrift = true)
    }.getMessage.contains("never saw"))
  }

  test("plan shape: one full-outer join, no window, no cartesian") {
    val prev = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "v")
    val cur = (500L to 1500L).map(i => (i, i * 3)).toDF("k", "v")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try ChangeFeed.diff(prev, cur, Seq("k")).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val s = plan.toString
    assert(!s.contains("CartesianProduct"))
    assert(!s.contains("Window"))
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(joins.size == 1, s"expected exactly one keyed join:\n$s")
  }

  test("applyFeed(prev, diff(prev, cur)) reconstructs cur exactly") {
    // incremental view maintenance round-trip, including every change
    // class at once (insert, delete, update) plus untouched keys and
    // null values on both sides
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, null: String))
      .toDF("k", "v")
    val cur = Seq((2L, "b"), (3L, "C"), (4L, "d"), (5L, "e"))
      .toDF("k", "v")
    val feed = ChangeFeed.diff(prev, cur, Seq("k"))
    val rebuilt = ChangeFeed.applyFeed(prev, feed, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val want = cur.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq
    assert(rebuilt == want)
    // and an EMPTY feed is the identity
    val idFeed = ChangeFeed.diff(cur, cur, Seq("k"))
    assert(idFeed.isEmpty)
    val same = ChangeFeed.applyFeed(cur, idFeed, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(same == want)
  }

  test("null KEY values round-trip: diff emits delete+insert, applyFeed removes the stale row") {
    // equality joins never match null keys, so diff classifies a
    // null-keyed change as delete + insert; applyFeed's anti-join must
    // be null-SAFE or the stale null-keyed row would survive and
    // duplicate the incoming one
    val prev = Seq((Option(1L), "a"), (Option.empty[Long], "x"))
      .toDF("k", "v")
    val cur = Seq((Option(1L), "a"), (Option.empty[Long], "y"))
      .toDF("k", "v")
    val feed = ChangeFeed.diff(prev, cur, Seq("k"))
    val classes = feed.select("change_type").collect().map(_.getString(0)).sorted
    assert(classes.toSeq == Seq("delete", "insert"))
    val rebuilt = ChangeFeed.applyFeed(prev, feed, Seq("k"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rebuilt == Seq((-1L, "y"), (1L, "a")))
  }

  test("reserved column names are rejected loudly") {
    val bad = Seq((1L, "a")).toDF("k", "change_type")
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.diff(bad, bad, Seq("k"))
    }.getMessage.contains("reserved names"))
  }

  test("applyFeedToTable maintains a persisted table; replaying the same feed is idempotent") {
    val path = java.nio.file.Files.createTempDirectory("cdc_apply").toString + "/state"
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val cur = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("k", "v")
    prev.write.parquet(path)
    val feed = ChangeFeed.diff(prev, cur, Seq("k")).localCheckpoint()
    def state() = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    ChangeFeed.applyFeedToTable(feed, path, Seq("k"))
    val want = Seq((2L, "b"), (3L, "C"), (4L, "d"))
    assert(state() == want)
    // at-least-once replay of the SAME feed converges, not duplicates
    ChangeFeed.applyFeedToTable(feed, path, Seq("k"))
    assert(state() == want)
  }

  test("applyFeedToTable bootstraps a missing table from a pure-insert feed") {
    // the standard CDC initial-snapshot bootstrap: the consumer starts
    // from nothing, the first feed is all inserts
    val path = java.nio.file.Files.createTempDirectory("cdc_boot").toString + "/state"
    val cur = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val feed = ChangeFeed.diff(cur.limit(0), cur, Seq("k"))
    ChangeFeed.applyFeedToTable(feed, path, Seq("k"))
    val got = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "a"), (2L, "b")))
  }

  test("applyFeedToTable refuses a feed with two incoming rows for one key") {
    // a multi-commit batch (insert then update for the same key) would
    // leave both rows — one stale — in the materialization
    val path = java.nio.file.Files.createTempDirectory("cdc_multi").toString + "/state"
    Seq((9L, "z")).toDF("k", "v").write.parquet(path)
    val badFeed = Seq(
      (1L, "insert", "a"), (1L, "update_postimage", "b"))
      .toDF("k", "change_type", "v")
    assert(intercept[IllegalArgumentException] {
      ChangeFeed.applyFeedToTable(badFeed, path, Seq("k"))
    }.getMessage.contains("compact it to one change per key"))
  }

  test("streaming applyFeedEachBatch: feed micro-batches maintain the materialization") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("cdc_stream").toString + "/state"
    val s0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val s1 = Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("k", "v")
    val s2 = Seq((2L, "B"), (3L, "c"), (4L, "d")).toDF("k", "v")
    s0.write.parquet(path)
    val mem = MemoryStream[(Long, String, String)]
    def feedRows(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      ChangeFeed.diff(a, b, Seq("k")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val q = graft.streaming.StreamingOps.applyFeedEachBatch(
      mem.toDF().toDF("k", "change_type", "v"), path, Seq("k")).start()
    try {
      mem.addData(feedRows(s0, s1): _*)
      q.processAllAvailable()
      mem.addData(feedRows(s1, s2): _*)
      q.processAllAvailable()
      val got = spark.read.parquet(path).collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got == Seq((2L, "B"), (3L, "c"), (4L, "d")))
    } finally q.stop()
  }

  test("StagedSink composition: diff(generation=previous, current) is the commit's change feed") {
    val path = java.nio.file.Files.createTempDirectory("cdc_staged").toString
    def write(vals: Seq[(Long, String)], mode: String): Unit =
      vals.toDF("k", "v").write.format("graft.sources.StagedSink")
        .option("path", path).mode(mode).save()
    write(Seq((1L, "a"), (2L, "b"), (3L, "c")), "append")
    write(Seq((2L, "b"), (3L, "C"), (4L, "d")), "overwrite")
    val feed = ChangeFeed.diff(
      StagedSink.readPreviousGeneration(spark, path),
      StagedSink.readCommitted(spark, path), Seq("k"))
    assert(rows(feed) == Seq(
      (1L, "delete", "a"),
      (3L, "update_postimage", "C"),
      (3L, "update_preimage", "c"),
      (4L, "insert", "d")))
  }
}
