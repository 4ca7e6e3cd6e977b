package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._

class VectorSpec extends SparkSpec {
  import spark.implicits._

  test("dot / l2Norm / cosine match hand-computed values") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, -5.0, 6.0))).toDF("a", "b")
      .select(
        VectorOps.dot(col("a"), col("b")).as("dot"),
        VectorOps.l2Norm(col("a")).as("na"),
        VectorOps.cosine(col("a"), col("b")).as("cos"))
    val r = df.head()
    assert(r.getDouble(0) == 1.0 * 4 - 2 * 5 + 3 * 6) // 12
    assert(math.abs(r.getDouble(1) - math.sqrt(14)) < 1e-12)
    val expCos = 12.0 / (math.sqrt(14) * math.sqrt(16 + 25 + 36))
    assert(math.abs(r.getDouble(2) - expCos) < 1e-12)
  }

  test("bruteForceTopK returns exact neighbors in rank order, self excluded") {
    // 2-d vectors at known angles from the x axis
    def vec(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val d = Seq((0L, vec(0)), (1L, vec(10)), (2L, vec(45)), (3L, vec(90)))
      .toDF("vec_id", "embedding")
    val top = VectorOps.bruteForceTopK(d.filter(col("vec_id") === 0), d, k = 3)
      .orderBy("rk").select("n_id").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L, 3L)) // by increasing angle distance
  }

  test("graft_ann SQL table function: brute and ivf modes match the API") {
    def vec(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val d = Seq((0L, vec(0)), (1L, vec(10)), (2L, vec(45)), (3L, vec(90)))
      .toDF("vec_id", "embedding")
    d.filter(col("vec_id") === 0).createOrReplaceTempView("ann_sql_q")
    d.createOrReplaceTempView("ann_sql_c")
    val sqlTop = spark.sql(
      "SELECT n_id FROM graft_ann('ann_sql_q', 'ann_sql_c', '3') ORDER BY rk")
      .as[Long].collect().toSeq
    assert(sqlTop == Seq(1L, 2L, 3L))
    // ivf mode on a corpus below the cell minimum falls back to the
    // exact scan (the operator's own contract) — same rows either way
    val ivfTop = spark.sql(
      "SELECT n_id FROM graft_ann('ann_sql_q', 'ann_sql_c', '3', 'ivf') " +
        "ORDER BY rk").as[Long].collect().toSeq
    assert(ivfTop == Seq(1L, 2L, 3L))
    intercept[Exception](spark.sql(
      "SELECT * FROM graft_ann('ann_sql_q', 'ann_sql_c')"))
    intercept[Exception](spark.sql(
      "SELECT * FROM graft_ann('ann_sql_q', 'ann_sql_c', '3', 'hnsw')"))
  }

  test("lshTopK achieves >=60% recall@5 vs brute force on real embeddings") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 20)
    val exact = VectorOps.bruteForceTopK(q, e, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = VectorOps.lshTopK(q, e, k = 5, bits = 4, dim = 64)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("bqTopK: Hamming candidates + exact rerank reach >=60% recall@5; " +
      "rerank=all equals brute force exactly") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 20)
    val exact = VectorOps.bruteForceTopK(q, e, k = 5)
      .select("q_id", "rk", "n_id", "cos_sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    val bq = VectorOps.bqTopK(q, e, k = 5, dim = 64, rerank = 50)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact.map(t => (t._1, t._3)) intersect bq).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
    // with the candidate cut wider than the corpus, the rerank IS brute
    // force — rank/score parity proves the rerank arithmetic is exact
    val n = e.count().toInt
    val full = VectorOps.bqTopK(q, e, k = 5, dim = 64, rerank = n)
      .select("q_id", "rk", "n_id", "cos_sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(full == exact)
  }

  test("aggregator top-k (partial-agg reduction) equals the window form exactly") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val win = VectorOps.bruteForceTopK(q, e, k = 5)
      .select("q_id", "rk", "n_id", "cos_sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    val agg = VectorOps.bruteForceTopKAgg(q, e, k = 5)
      .select("q_id", "rk", "n_id", "cos_sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(agg == win)
  }

  test("ivfTopK achieves >=60% recall@5 vs brute force on real embeddings") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 20)
    val exact = VectorOps.bruteForceTopK(q, e, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = VectorOps.ivfTopK(q, e, k = 5, nlist = 16, nprobe = 8)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("hyperplaneSignature is deterministic and within [0, 2^bits)") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val sigs = e.select(
      VectorOps.hyperplaneSignature(
        VectorOps.toDoubleVec(col("embedding")), bits = 4, dim = 64).as("s"))
      .as[Long].collect()
    assert(sigs.forall(s => s >= 0 && s < 16))
    val sigs2 = e.select(
      VectorOps.hyperplaneSignature(
        VectorOps.toDoubleVec(col("embedding")), bits = 4, dim = 64).as("s"))
      .as[Long].collect()
    assert(sigs.toSeq == sigs2.toSeq)
  }

  test("kMeansIteration: one Lloyd round recovers planted cluster means") {
    // two tight clusters around (10,0) and (0,10); whatever the two
    // md5-sampled seeds are, cosine assignment separates the clusters
    // (cosine is scale-free: every A-point is ~(1,0)-ish, every B-point
    // ~(0,1)-ish), so per-cell means must equal the per-cluster means
    val pts = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, Seq(10.0 + (i % 5) * 0.01, 0.1))
      else (i.toLong, Seq(0.1, 10.0 + (i % 5) * 0.01))
    }
    val df = pts.toDF("vec_id", "embedding")
    val out = VectorOps.kMeansIteration(df, kCells = 2, vecCol = "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // both cells used, all vectors accounted for at every position
    assert(out.keys.map(_._1).toSet.size == 2)
    assert(out.filter(_._1._2 == 0L).values.map(_._1).sum == 20L)
    // per-cell mean at pos 0: one cell ~10, the other ~0.1 (and mirrored
    // at pos 1) — i.e. the planted cluster means, regardless of which
    // seed landed in which cell
    def mean(cell: Long, pos: Long): Double = {
      val (n, ss) = out((cell, pos)); ss.toDouble / n / (1L << 20)
    }
    val p0 = Set(mean(0, 0), mean(1, 0)).toSeq.sorted
    assert(math.abs(p0.head - 0.1) < 0.01 && math.abs(p0.last - 10.02) < 0.05, p0.toString)
    val p1 = Set(mean(0, 1), mean(1, 1)).toSeq.sorted
    assert(math.abs(p1.head - 0.1) < 0.01 && math.abs(p1.last - 10.02) < 0.05, p1.toString)
  }

  test("native cell assignment is bit-identical to the literal array_min form") {
    // graft_nearest_cell must reproduce kMeansIterationFrom's assignment
    // arithmetic AND tie-break (lowest cell wins equal sims) exactly —
    // this is the train/index parity invariant ivfTopK documents.
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = VectorOps.kMeansInit(e, kCells = 24)
    val flat = lit(cents.flatten.toArray)
    val dim = cents.head.size
    // literal form: array_min over (-sim, cell), as kMeansIterationFrom
    val vec = VectorOps.toDoubleVec(col("embedding"))
    val vnorm = sqrt(VectorOps.dot(vec, vec))
    val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    val negSims = array(cents.zipWithIndex.toIndexedSeq.map { case (c, i) =>
      struct((-(VectorOps.dot(vec, array(c.map(lit): _*)) / (vnorm * lit(norms(i))))).as("nsim"),
        lit(i).as("cell"))
    }: _*)
    val both = e.select(
      call_function("graft_nearest_cell", vec, flat, lit(dim)).as("native"),
      array_min(negSims).getField("cell").as("literal"))
    assert(both.filter(col("native") =!= col("literal")).count() == 0)

    // an exact similarity tie (duplicated centroid) keeps the lowest cell
    val dup = Array(cents.head, cents.head, cents.last)
    val tied = e.limit(20).select(
      call_function("graft_nearest_cell", vec, lit(dup.flatten.toArray), lit(dim)).as("c"))
      .as[Int].collect()
    assert(!tied.contains(1), "tie must resolve to the lowest duplicate cell")
  }

  test("ivfTopK plans thousands of cells without literal-tree blowup") {
    // nlist=1024 as plan literals would be ~65k expression nodes; the
    // flat-array kernel form must plan in ordinary time and keep recall.
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val t0 = System.nanoTime()
    val approx = VectorOps.ivfTopK(q, e, k = 5, nlist = 256, nprobe = 64)
    val planned = approx.queryExecution.executedPlan // force physical planning
    val planSecs = (System.nanoTime() - t0) / 1e9
    assert(planSecs < 30, s"planning took $planSecs s")
    assert(planned != null)
    val exact = VectorOps.bruteForceTopK(q, e, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val got = approx.select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("pqTopK: compressed-domain recall; exact rerank recovers brute-force quality") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 20)
    val exact = VectorOps.bruteForceTopK(q, e, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "n_id").as[(Long, Long)].collect().toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val adc = recall(VectorOps.pqTopK(q, e, k = 5, dsub = 8, ksub = 64, trainRounds = 3))
    val reranked = recall(VectorOps.pqTopK(q, e, k = 5, dsub = 8, ksub = 64,
      trainRounds = 3, rerank = 100))
    info(f"ADC recall=$adc%.2f reranked=$reranked%.2f")
    assert(adc >= 0.2, s"raw ADC recall too low: $adc")
    assert(reranked >= 0.8, s"exact rerank should recover most of top-5: $reranked")
  }

  test("ivfPqTopK: two-tier pruned+compressed scan keeps usable recall; rerank recovers") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 20)
    val exact = VectorOps.bruteForceTopK(q, e, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "n_id").as[(Long, Long)].collect().toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val two = recall(VectorOps.ivfPqTopK(q, e, k = 5, nlist = 16, nprobe = 8, ksub = 64))
    val rr = recall(VectorOps.ivfPqTopK(q, e, k = 5, nlist = 16, nprobe = 8, ksub = 64,
      rerank = 100))
    info(f"ivfpq recall=$two%.2f reranked=$rr%.2f")
    // two approximations stack (cell pruning x quantization), so the raw
    // bound is looser than either tier alone; exact rerank restores most
    assert(two >= 0.15, s"two-tier recall too low: $two")
    assert(rr >= 0.5, s"reranked two-tier recall too low: $rr")
  }

  test("pq codes compress to M small ints; score is table-lookup-only") {
    // the memory claim the tier exists for: codes column is M=8 ints per
    // row (vs 64 doubles), and scoring touches only codes + the table
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val flat = VectorOps.pqCodebook(e, dsub = 8, ksub = 16)
    val codes = e.select(call_function("graft_pq_encode",
      VectorOps.toDoubleVec(col("embedding")), lit(flat), lit(8), lit(16)).as("c"))
    val first = codes.limit(5).as[Seq[Int]].collect()
    assert(first.forall(c => c.length == 8 && c.forall(j => j >= 0 && j < 16)))
  }

  test("kMeansCentroids converges to planted cluster means; trained IVF keeps recall") {
    val pts = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, Seq(10.0 + (i % 7) * 0.01, 0.1))
      else (i.toLong, Seq(0.1, 10.0 + (i % 7) * 0.01))
    }
    val df = pts.toDF("vec_id", "embedding")
    val cents = VectorOps.kMeansCentroids(df, kCells = 2, rounds = 3)
    // after Lloyd rounds the two centroids sit at the two cluster means
    // (order unknown): one ~(10.03, 0.1), the other ~(0.1, 10.03)
    val sortedByX = cents.sortBy(_.head)
    assert(math.abs(sortedByX(0)(0) - 0.1) < 0.02 &&
      math.abs(sortedByX(0)(1) - 10.03) < 0.05, cents.map(_.mkString(",")).mkString(" | "))
    assert(math.abs(sortedByX(1)(0) - 10.03) < 0.05 &&
      math.abs(sortedByX(1)(1) - 0.1) < 0.02, cents.map(_.mkString(",")).mkString(" | "))

    // trained centroids drop into ivfTopK unchanged-plan; recall holds
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 20)
    val exact = VectorOps.bruteForceTopK(q, e, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = VectorOps.ivfTopK(q, e, k = 5, nlist = 16, nprobe = 8, trainRounds = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("covarianceUpper + topEigenpair: distributed moments, local eigen (PCA split)") {
    // Known 2-d covariance: points along y = 2x have cov = [[v, 2v], [2v, 4v]]
    val pts = Seq(-2.0, -1.0, 0.0, 1.0, 2.0)
    val d = pts.map(x => Seq(x.toFloat, (2 * x).toFloat)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val cov = VectorOps.covarianceUpper(d, "embedding")
      .orderBy("i", "j").as[(Long, Long, Double)].collect()
    val v = pts.map(x => x * x).sum / pts.size // 2.0
    assert(cov.toSeq == Seq((1L, 1L, v), (1L, 2L, 2 * v), (2L, 2L, 4 * v)))

    // Top eigenpair of [[2, 4], [4, 8]]: lambda = 10, v ∝ (1, 2)
    val m = Array(Array(v, 2 * v), Array(2 * v, 4 * v))
    val (lambda, vec) = VectorOps.topEigenpair(m)
    assert(math.abs(lambda - 5 * v) < 1e-9, s"lambda=$lambda")
    assert(math.abs(math.abs(vec(1) / vec(0)) - 2.0) < 1e-9)

    // Real embeddings: the collected covariance (d^2 scalars, the only
    // driver traffic) must satisfy the eigen residual ||Cv - lv|| << l.
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val rows = VectorOps.covarianceUpper(e, "embedding")
      .as[(Long, Long, Double)].collect()
    val dim = rows.map(_._2).max.toInt
    val c = Array.ofDim[Double](dim, dim)
    rows.foreach { case (i, j, x) =>
      c(i.toInt - 1)(j.toInt - 1) = x; c(j.toInt - 1)(i.toInt - 1) = x
    }
    val (l, ev) = VectorOps.topEigenpair(c)
    val res = (0 until dim).map { i =>
      val cv = (0 until dim).map(j => c(i)(j) * ev(j)).sum
      val r = cv - l * ev(i); r * r
    }.sum
    assert(l > 0, s"top eigenvalue $l not positive")
    // Residual floor is the query's own 1e-6 entry rounding: each C
    // entry carries ±5e-7 quantization, so (Cv)_i picks up at most
    // d·5e-7 (|v| = 1) and the l2 residual at most d^1.5·5e-7. Observed
    // ~4e-6 — well under the bound, far over float-exactness.
    assert(math.sqrt(res) <= dim * 1e-6,
      s"residual ${math.sqrt(res)} vs rounding floor ${dim * 1e-6} (lambda $l)")
  }

  test("mmrSelect with k past the candidate count returns what exists") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.8, 0.2)), (3L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val out = VectorOps.mmrSelect(corpus, Seq(1.0, 0.0), k = 10, lambda = 0.7)
      .collect()
    assert(out.length == 3, s"expected 3 rows for a 3-doc corpus, got ${out.length}")
    assert(out.map(_.getLong(1)).toSet == Set(1L, 2L, 3L))
    // greedy order still holds: most query-similar first
    assert(out.head.getLong(1) == 1L)
  }
}
