package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the behavioral-analytics / sampling operators
  * added in round 6 (q_funnel, q_cohort_retention, q_scd2, q_anomaly_mad,
  * q_mix_sample, q_weighted_sample). Exact values are oracle-checked by
  * the driver's DuckDB gate; these tests pin the properties a hash
  * compare can't explain when it breaks — monotonicity, tiling, budget
  * respect, determinism.
  */
class AnalyticsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("funnel stage counts are monotonically non-increasing") {
    val rows = run("q_funnel").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("view", "click", "purchase"))
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, counts.toSeq)
    // every stage is reachable in the dense synthetic events table
    assert(counts.head > 0)
  }

  test("funnel steps are ordered per user: click never precedes a view") {
    // recompute the per-user stage times the query folds away, and check
    // the chain ordering holds on the raw data
    val e = Tables(spark, sf, "events")
    val firstView = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val chained = e.filter(col("event_type") === "click")
      .join(firstView, "user_id")
      .filter(col("ts") >= col("t1"))
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val nClickUsers = chained.count()
    val reported = run("q_funnel").filter(col("stage") === "click")
      .head().getLong(2)
    assert(reported == nClickUsers)
  }

  test("cohort retention: week 0 of each cohort counts its full cohort") {
    val ret = run("q_cohort_retention").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cohortSizes = ret.collect { case ((wk, 0L), n) => wk -> n }
    assert(cohortSizes.nonEmpty)
    // no retention cell can exceed its cohort's week-0 size
    ret.foreach { case ((wk, _), n) =>
      cohortSizes.get(wk).foreach(size => assert(n <= size, s"$wk: $n > $size"))
    }
  }

  test("scd2 ranges tile each user's timeline with no gaps or overlaps") {
    val rows = run("q_scd2").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      // versions are 1..n dense
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      // valid_to of run k == valid_from of run k+1; only the last is open
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getString(4) == b.getString(3))
        assert(!a.getBoolean(5))
      }
      assert(sorted.last.isNullAt(4) && sorted.last.getBoolean(5))
      // consecutive runs changed state (else they'd be one run)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getString(2) != b.getString(2))
      }
    }
    // run event counts reconstruct the full changelog
    val total = rows.map(_.getLong(6)).sum
    assert(total == Tables(spark, sf, "events").count())
  }

  test("anomaly_mad flags only scores above threshold, robustly scaled") {
    val out = run("q_anomaly_mad").collect()
    assert(out.forall(_.getDouble(3) > 3.0))
    // exact score values are the oracle's job; here: flagged events are
    // unique and every score clears the threshold
    assert(out.map(_.getLong(1)).distinct.length == out.length)
  }

  test("mix_sample respects the per-source token budget exactly") {
    val out = run("q_mix_sample").collect()
    val bySource = out.groupBy(_.getString(1))
    bySource.foreach { case (src, rs) =>
      val maxCum = rs.map(_.getLong(3)).max
      assert(maxCum <= 600, s"$src exceeded budget: $maxCum")
      // cum_tok of the selected prefix equals the sum of its n_tok
      assert(rs.map(_.getLong(2)).sum == maxCum, src)
    }
  }

  test("mix_reweight: alphas normalize, the uniform floor holds, excess is monotone in alpha") {
    val out = run("q_mix_reweight").collect()
    val k = out.length
    assert(k > 1)
    // (source, n_docs, mean_loss, excess, alpha, alpha_mix)
    val alphas = out.map(_.getDouble(4))
    assert(math.abs(alphas.sum - 1.0) < 1e-9, s"alphas sum to ${alphas.sum}")
    // the 0.2/k smoothing floor: no domain starves
    out.map(_.getDouble(5)).foreach(am =>
      assert(am >= 0.2 / k - 1e-12, s"alpha_mix $am under the floor"))
    // multiplicative weights: more excess loss -> never less mixture
    val byExcess = out.map(r => (r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    byExcess.zip(byExcess.tail).foreach { case ((e1, a1), (e2, a2)) =>
      assert(a1 <= a2 + 1e-12, s"alpha not monotone: ($e1,$a1) vs ($e2,$a2)")
    }
    // only above-mean domains get upweighted past uniform
    out.foreach { r =>
      if (r.getDouble(3) == 0.0) assert(r.getDouble(4) <= 1.0 / k + 1e-9)
    }
  }

  test("weighted_sample picks exactly 5 per source, deterministically") {
    val a = run("q_weighted_sample").collect().map(_.getLong(0)).toSeq
    val b = run("q_weighted_sample").collect().map(_.getLong(0)).toSeq
    assert(a == b) // same plan, same hash priorities, same draw
    val perSource = run("q_weighted_sample").groupBy("source").count().collect()
    assert(perSource.forall(_.getLong(1) == 5L))
    // weighting is real: selected docs skew longer than the corpus mean
    val selMean = run("q_weighted_sample").agg(avg("n_chars")).head().getDouble(0)
    val allMean = Tables(spark, sf, "documents").agg(avg("n_chars")).head().getDouble(0)
    assert(selMean > allMean * 0.9, s"sel=$selMean all=$allMean")
  }

  test("stats-tier range invariants: entropy, ACF, Gini, drawdown, recall, chi2") {
    // entropy in [0, ln k] and normalized form in [0, 1]
    run("q_entropy").collect().foreach { r =>
      val k = r.getAs[Long]("n_types")
      val h = r.getAs[Double]("entropy")
      val hn = r.getAs[Double]("entropy_norm")
      assert(h >= 0.0 && h <= math.log(k.toDouble) + 1e-6, s"H=$h k=$k")
      assert(hn >= 0.0 && hn <= 1.0 + 1e-9, s"Hn=$hn")
    }
    run("q_autocorr").collect().foreach { r =>
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0 - 1e-12 && a <= 1.0 + 1e-12, s"acf=$a")
    }
    run("q_gini").collect().foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0, s"gini=$g")
    }
    run("q_drawdown").collect().foreach { r =>
      assert(r.getAs[Double]("max_drawdown") >= 0.0)
    }
    run("q_matryoshka").collect().foreach { r =>
      val rec = r.getAs[Double]("recall_at5")
      assert(rec >= 0.0 && rec <= 1.0, s"recall=$rec")
    }
    run("q_chi2").collect().foreach { r =>
      assert(r.getAs[Double]("chi2") >= 0.0)
    }
  }

  test("streaks tile the active days; benford shares sum to 1") {
    run("q_streak").collect().foreach { r =>
      val longest = r.getAs[Long]("longest_streak")
      val active = r.getAs[Long]("n_active_days")
      val nStreaks = r.getAs[Long]("n_streaks")
      assert(longest >= 1 && longest <= active)
      assert(nStreaks >= 1 && nStreaks <= active)
    }
    val shares = run("q_benford").collect().map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-4, shares.sum)
  }

  test("growth accounting: WAU >= DAU, cumulative users monotone, totals consistent") {
    val rows = run("q_growth_accounting").collect()
    val cums = rows.map(_.getAs[Long]("cum_users"))
    rows.foreach { r =>
      assert(r.getAs[Long]("wau") >= r.getAs[Long]("dau"))
    }
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
    val totalUsers = Tables(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(cums.last == totalUsers)
    assert(rows.map(_.getAs[Long]("new_users")).sum == totalUsers)
  }

  test("theil-sen slope lies within the pairwise slope envelope") {
    val daily = Tables(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"), unix_date(col("day")).cast("long").as("d"), col("c"))
      .collect().groupBy(_.getString(0))
    run("q_theil_sen").collect().foreach { r =>
      val t = r.getString(0)
      val pts = daily(t).map(x => (x.getAs[Long]("d"), x.getAs[Long]("c"))).sortBy(_._1)
      val slopes = for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1)
      val ts = r.getAs[Double]("ts_slope")
      assert(ts >= slopes.min - 1e-12 && ts <= slopes.max + 1e-12, s"$t: $ts")
      assert(r.getAs[Long]("n_pairs") == slopes.length)
    }
  }

  test("q_recursive_cal executes under the shipped JVM flags (add-opens guard)") {
    // The recursive CTE's anchor materializes a DATE row on the DRIVER,
    // which reaches sun.util.calendar — the only query in the catalog
    // that does. Without build.sbt's `--add-opens java.base/
    // sun.util.calendar=ALL-UNNAMED` it throws EXPRESSION_DECODING_
    // FAILED while every other query works (observed in the r10 bare-
    // java sweep). Executing it here makes removing that flag from
    // build.sbt a test failure, not a one-query phantom regression in
    // some future bench run.
    val rows = run("q_recursive_cal").collect()
    assert(rows.length > 12, s"expected a multi-month spine, got ${rows.length}")
    // contiguous month spine: every consecutive pair is one month apart
    val months = rows.map(_.getString(0)).toSeq
    assert(months == months.sorted && months.distinct == months, months)
  }

  test("q_isotonic_cal: fitted curve is monotone, bounded, and mean-preserving") {
    val rows = run("q_isotonic_cal").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(rows.nonEmpty)
    val fitted = rows.map(_._4)
    // PAV's defining guarantee: the fit is non-decreasing in the bin
    assert(fitted.zip(fitted.tail).forall { case (a, b) => a <= b + 1e-12 },
      fitted.toSeq)
    assert(fitted.forall(f => f >= 0.0 && f <= 1.0))
    // PAV preserves the weighted mean: sum n_b * fitted_b == sum of
    // positives (each pool's fit IS its pooled rate)
    val fitMass = rows.map { case (_, n, _, f) => n * f }.sum
    val posMass = rows.map(_._3).sum.toDouble
    assert(math.abs(fitMass - posMass) < 1e-6, s"$fitMass vs $posMass")
  }

  test("q_record_linkage: score is monotone in the agreement-bit partial order") {
    val rows = run("q_record_linkage").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every realized single-bit upgrade (pattern -> pattern | bit) must
    // raise the score: each field's literal m exceeds its data-derived u
    for {
      (p, s0) <- rows; bit <- Seq(1L, 2L, 4L)
      s1 <- rows.get(p | bit) if (p & bit) == 0
    } assert(s1 > s0, s"pattern $p -> ${p | bit}: $s0 !< $s1")
    // pair count conservation against a direct recount of the block join
    val c = Tables(spark, sf, "customer")
    val even = c.filter(col("c_custkey") % 2 === 0)
      .groupBy("c_nationkey").agg(count(lit(1)).as("ne"))
    val odd = c.filter(col("c_custkey") % 2 === 1)
      .groupBy("c_nationkey").agg(count(lit(1)).as("no"))
    val expected = even.join(odd, "c_nationkey")
      .agg(sum(col("ne") * col("no"))).head().getLong(0)
    val reported = run("q_record_linkage").agg(sum("n_pairs")).head().getLong(0)
    assert(reported == expected, s"$reported != $expected")
  }

  test("q_shard_assign: HRW resize moves documents only INTO the added shard") {
    val rows = run("q_shard_assign").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // rendezvous hashing's minimal-disruption guarantee: a doc's argmax
    // over 9 shards differs from its argmax over 8 only when shard 8 wins
    rows.filter { case (o, n, _) => o != n }.foreach { case (o, n, c) =>
      assert(n == 8L, s"moved $o -> $n ($c docs): HRW stability violated")
    }
    val total = rows.map(_._3).sum
    val docs = Tables(spark, sf, "documents").count()
    assert(total == docs, s"$total != $docs")
    // expected movement ~ 1/9 of the corpus; generous envelope for sf0.001
    val moved = rows.filter { case (o, n, _) => o != n }.map(_._3).sum
    assert(moved > 0 && moved.toDouble / total < 0.3,
      s"moved $moved of $total")
  }

  test("q_blocklist: roll-up row is consistent and one phrase recounts exactly") {
    val rows = run("q_blocklist").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (any, per) = rows.partition(_._1 == "__any__")
    assert(any.length == 1 && per.length == 10)
    // total occurrences decompose exactly; the flagged-doc count is
    // bounded by the per-phrase sum (inclusion) and by each max
    assert(any.head._3 == per.map(_._3).sum)
    // flagged-docs: bounded above by the per-phrase sum (union bound)
    // and below by every single phrase's hit count (containment)
    assert(any.head._2 <= per.map(_._2).sum)
    assert(per.forall(_._2 <= any.head._2))
    // independent recount of one phrase by a direct substring scan
    val p = "slow scan"
    val direct = Tables(spark, sf, "documents")
      .filter(col("text").contains(p)).count()
    val reported = per.find(_._1 == p).get._2
    assert(reported == direct, s"$reported != $direct")
  }
}
