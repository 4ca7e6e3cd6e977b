package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("misraGries never misses an item above the n/(k+1) undercount bound") {
    // zipf-ish stream: item i appears ~1000/i times
    val stream = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"item$i"))
    val shuffled = new scala.util.Random(7).shuffle(stream)
    val n = shuffled.size
    val k = 10
    val sketch = HeavyHitters.misraGries(shuffled.iterator, k)
    assert(sketch.size <= k)
    val exact = shuffled.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // guarantee: every item with count > n/(k+1) is present
    exact.filter(_._2 > n.toLong / (k + 1)).keys.foreach { hh =>
      assert(sketch.contains(hh), s"$hh missing from sketch $sketch")
    }
    // and sketch weights never exceed true counts
    sketch.foreach { case (item, w) => assert(w <= exact(item)) }
  }

  test("frequentItems equals the naive group-count-filter exactly") {
    // many partitions so the per-partition sketch + merge path is real
    val items = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"t$i"))
    val df = spark.createDataset(items).toDF("item").repartition(8)
    val k = 15
    val got = HeavyHitters.frequentItems(df, "item", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = items.size
    val expected = items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c > n.toDouble / k }.toMap
    assert(got == expected)
  }

  test("pass 2 shuffles only the candidate domain (plan has broadcast semi-join)") {
    val df = spark.createDataset(Seq.fill(100)("a") ++ (1 to 50).map("u" + _))
      .toDF("item").repartition(4)
    val out = HeavyHitters.frequentItems(df, "item", 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
    assert(out.collect().map(_.getString(0)).toSeq == Seq("a"))
  }

  test("null items are ignored, not counted or emitted") {
    val df = Seq(Some("x"), Some("x"), Some("x"), None, None, Some("y"))
      .toDF("item")
    val got = HeavyHitters.frequentItems(df, "item", 2)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("x"))
  }

  test("mergeReduce: bound holds over ANY random batch split, result split-invariant") {
    val rnd = new scala.util.Random(11)
    val stream = (1 to 40).flatMap(i => Seq.fill(600 / i)(s"w$i"))
    val shuffled = rnd.shuffle(stream)
    val n = shuffled.size
    val k = 8
    val exact = shuffled.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def countMap(xs: Seq[String]) =
      xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    (1 to 20).foreach { trial =>
      // random split into 1..6 batches, folded left like the stream does
      val nb = 1 + rnd.nextInt(6)
      val cuts = (Seq(0, n) ++ Seq.fill(nb - 1)(rnd.nextInt(n + 1))).sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => shuffled.slice(a, b) }
      val sketch = batches.foldLeft(Map.empty[String, Long]) { (st, batch) =>
        HeavyHitters.mergeReduce(st, countMap(batch), k)
      }
      assert(sketch.size <= k, s"trial $trial: ${sketch.size} > $k")
      // undercount bound and never-overcount, for every item
      exact.foreach { case (item, c) =>
        val w = sketch.getOrElse(item, 0L)
        assert(w <= c, s"trial $trial: $item overcounted $w > $c")
        assert(c - w <= n.toLong / (k + 1),
          s"trial $trial: $item undercount ${c - w} > ${n / (k + 1)}")
      }
      // completeness: items above the bound always survive
      exact.filter(_._2 > n.toLong / (k + 1)).keys.foreach { hh =>
        assert(sketch.contains(hh), s"trial $trial: $hh missing")
      }
    }
    // one-shot (single batch) is itself a valid split — the fold is a
    // deterministic function of (state, batch counts), so replaying the
    // SAME split must reproduce the same sketch byte-for-byte
    val once = HeavyHitters.mergeReduce(Map.empty, countMap(shuffled), k)
    val again = HeavyHitters.mergeReduce(Map.empty, countMap(shuffled), k)
    assert(once == again)
  }
}
