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

  test("asOf tieBreak picks deterministically among equal-ts right rows (negate for max-wins)") {
    // the q_pit_enrich shape: one user with two SCD2 versions sharing a
    // valid_from timestamp — the enrichment must pick the LATEST version,
    // not whichever partition happened to scan last
    val purchases = Seq((7L, 100L, 1)).toDF("user_id", "ts", "event_id")
    val versions = Seq(
      (7L, 100L, 1L, "a", -1L), (7L, 100L, 2L, "b", -2L), (7L, 50L, 0L, "z", 0L)
    ).toDF("user_id", "ts", "version", "state", "negv")

    val j = AsOfJoin.asOf(purchases, versions, "user_id", "ts",
        Seq("version", "state"), tieBreak = Some("negv"))
      .select("event_id", "asof_version", "asof_state").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(j == Set((1, 2L, "b"))) // min(negv) = max(version) wins the tie

    // NTZ inputs are normalized internally — same join through
    // TimestampNTZType ts columns must not throw and must agree
    val pNtz = purchases.withColumn("ts",
      timestamp_micros(col("ts") * 1000).cast(org.apache.spark.sql.types.TimestampNTZType))
    val vNtz = versions.withColumn("ts",
      timestamp_micros(col("ts") * 1000).cast(org.apache.spark.sql.types.TimestampNTZType))
    val jNtz = AsOfJoin.asOf(pNtz, vNtz, "user_id", "ts",
        Seq("version", "state"), tieBreak = Some("negv"))
      .select("event_id", "asof_version", "asof_state").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(jNtz == Set((1, 2L, "b")))
  }

  test("asOfForward attaches earliest right at-or-after; tolerance nulls far matches; ties break on min") {
    val trades = Seq(
      ("A", ms(10), 1), ("A", ms(25), 2), ("B", ms(5), 3), ("A", ms(200), 4)
    ).toDF("sym", "ts", "trade_id").withColumn("ts", timestamp_millis(col("ts")))
    val quotes = Seq(
      ("A", ms(8), 7L), ("A", ms(25), 5L), ("A", ms(25), 6L), ("A", ms(30), 8L),
      ("A", ms(300), 10L), ("B", ms(4), 9L)
    ).toDF("sym", "ts", "qid").withColumn("ts", timestamp_millis(col("ts")))

    val j = AsOfJoin.asOfForward(trades, quotes, "sym", "ts", Seq("qid"),
      toleranceMs = Some(20L * 60 * 1000), tieBreak = Some("qid"))
      .select("sym", "trade_id", "asof_qid").collect()
      .map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSet

    assert(j == Set(
      ("A", 1, 5L),   // next at-or-after min 10 is the min-25 pair; min qid wins the tie
      ("A", 2, 5L),   // equal ts counts as "after"
      ("B", 3, null), // only earlier quotes exist
      ("A", 4, null)))// nearest later quote (min 300) is 100 min away > 20 min tolerance
  }

  private def ms(m: Long): Long = m * 60L * 1000L

  test("asOfForward equals a naive per-row scan on random data (incl. repeated timestamps)") {
    val rnd = new scala.util.Random(13)
    // small ts domain forces same-key ts collisions -> exercises tieBreak
    val left = Seq.tabulate(120)(i =>
      (rnd.nextInt(6).toLong, ms(rnd.nextInt(40)), i.toLong))
    val right = Seq.tabulate(150)(i =>
      (rnd.nextInt(6).toLong, ms(rnd.nextInt(40)), 1000L + i))
    val tolMs = ms(10)
    val naive: Map[Long, Option[Long]] = left.map { case (k, t, id) =>
      id -> right.filter { case (rk, rt, _) => rk == k && rt >= t && rt - t <= tolMs }
        .sortBy { case (_, rt, rid) => (rt, rid) }.headOption.map(_._3)
    }.toMap
    val l = left.toDF("k", "tsm", "lid").withColumn("ts", timestamp_millis(col("tsm"))).drop("tsm")
    val r = right.toDF("k", "tsm", "rid").withColumn("ts", timestamp_millis(col("tsm"))).drop("tsm")
    val got = AsOfJoin.asOfForward(l, r, "k", "ts", Seq("rid"),
      toleranceMs = Some(tolMs), tieBreak = Some("rid"))
      .select("lid", "asof_rid").collect()
      .map(row => row.getLong(0) -> (if (row.isNullAt(1)) None else Some(row.getLong(1))))
      .toMap
    assert(got == naive)
  }

  test("backward asOf with tieBreak equals a naive scan on random data (repeated timestamps)") {
    val rnd = new scala.util.Random(47)
    // small ts domain forces same-key ts collisions -> the tieBreak path
    val left = Seq.tabulate(120)(i =>
      (rnd.nextInt(6).toLong, ms(rnd.nextInt(40)), i.toLong))
    val right = Seq.tabulate(150)(i =>
      (rnd.nextInt(6).toLong, ms(rnd.nextInt(40)), 1000L + i))
    // naive backward: latest rt <= t; ties at equal rt -> MIN rid
    val naive: Map[Long, Option[Long]] = left.map { case (k, t, id) =>
      id -> right.filter { case (rk, rt, _) => rk == k && rt <= t }
        .sortBy { case (_, rt, rid) => (-rt, rid) }.headOption.map(_._3)
    }.toMap
    val l = left.toDF("k", "tsm", "lid").withColumn("ts", timestamp_millis(col("tsm"))).drop("tsm")
    val r = right.toDF("k", "tsm", "rid").withColumn("ts", timestamp_millis(col("tsm"))).drop("tsm")
    val got = AsOfJoin.asOf(l, r, "k", "ts", Seq("rid"), tieBreak = Some("rid"))
      .select("lid", "asof_rid").collect()
      .map(row => row.getLong(0) -> (if (row.isNullAt(1)) None else Some(row.getLong(1))))
      .toMap
    assert(got == naive)
  }

  test("asOfNearest equals a naive min-|gap| scan (backward wins ties) on random data") {
    val rnd = new scala.util.Random(29)
    val left = Seq.tabulate(120)(i =>
      (rnd.nextInt(6).toLong, ms(rnd.nextInt(40)), i.toLong))
    val right = Seq.tabulate(150)(i =>
      (rnd.nextInt(6).toLong, ms(rnd.nextInt(40)), 1000L + i))
    val tolMs = ms(7)
    val naive: Map[Long, Option[Long]] = left.map { case (k, t, id) =>
      id -> right.filter { case (rk, rt, _) => rk == k && math.abs(rt - t) <= tolMs }
        // min gap, then backward-before-forward, then min rid
        .sortBy { case (_, rt, rid) => (math.abs(rt - t), if (rt <= t) 0 else 1, rid) }
        .headOption.map(_._3)
    }.toMap
    val l = left.toDF("k", "tsm", "lid").withColumn("ts", timestamp_millis(col("tsm"))).drop("tsm")
    val r = right.toDF("k", "tsm", "rid").withColumn("ts", timestamp_millis(col("tsm"))).drop("tsm")
    val got = AsOfJoin.asOfNearest(l, r, "k", "ts", Seq("rid"),
      toleranceMs = Some(tolMs), tieBreak = Some("rid"))
      .select("lid", "asof_rid").collect()
      .map(row => row.getLong(0) -> (if (row.isNullAt(1)) None else Some(row.getLong(1))))
      .toMap
    assert(got == naive)
  }

  test("asOfNearest plans ONE exchange for the two directional window scans") {
    val l = Seq((1L, ms(1), 1L)).toDF("k", "tsm", "lid")
      .withColumn("ts", timestamp_millis(col("tsm"))).drop("tsm")
    val r = Seq((1L, ms(2), 9L)).toDF("k", "tsm", "rid")
      .withColumn("ts", timestamp_millis(col("tsm"))).drop("tsm")
    val plan = AsOfJoin.asOfNearest(l, r, "k", "ts", Seq("rid"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one shuffle, got $exchanges:\n$plan")
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
