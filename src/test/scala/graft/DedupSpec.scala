package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** Hash-family dedup semantics on planted duplicates — the properties the
  * DuckDB oracle can't check (xxhash64 has no DuckDB twin).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "on the warm mat near the old wooden door of the quiet house"
  private val nearDup = base.replace("quiet house", "silent home") // ~2-shingle edit
  private val distinct1 =
    "completely different content about spark catalyst optimizer rules " +
      "and tungsten codegen stages for large scale data processing jobs"
  private val distinct2 =
    "yet another unrelated document mentioning minhash lsh banding and " +
      "jaccard similarity estimation over shingled token streams today"

  private def docs = Seq(
    (0L, base), (1L, base), (2L, nearDup), (3L, distinct1), (4L, distinct2)
  ).toDF("doc_id", "text")

  test("exactDupGroups groups identical texts, keeps min id") {
    val g = DedupOps.exactDupGroups(docs, "doc_id", "text")
    assert(g.count() == 4)
    val dupGroup = g.filter(col("n_copies") === 2).collect()
    assert(dupGroup.length == 1)
    assert(dupGroup.head.getAs[Long]("keep_id") == 0L)
  }

  test("exactDedup drops all-but-first per duplicate group") {
    val d = DedupOps.exactDedup(docs, "doc_id", "text")
    assert(d.select("doc_id").as[Long].collect().sorted.toSeq == Seq(0L, 2L, 3L, 4L))
  }

  test("graft_dedup SQL table function: both modes match the API") {
    docs.createOrReplaceTempView("dedup_sql_docs")
    val groups = spark.sql(
      "SELECT * FROM graft_dedup('dedup_sql_docs', 'doc_id', 'text') " +
        "ORDER BY text_hash").collect().map(_.toString).toSeq
    val groupsApi = DedupOps.exactDupGroups(docs, "doc_id", "text")
      .orderBy("text_hash").collect().map(_.toString).toSeq
    assert(groups == groupsApi)
    val survivors = spark.sql(
      "SELECT doc_id FROM graft_dedup('dedup_sql_docs', 'doc_id', 'text', " +
        "'dedup')").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(0L, 2L, 3L, 4L))
    intercept[Exception](spark.sql(
      "SELECT * FROM graft_dedup('dedup_sql_docs', 'doc_id')"))
    intercept[Exception](spark.sql(
      "SELECT * FROM graft_dedup('dedup_sql_docs', 'doc_id', 'text', 'fuzzy')"))
  }

  test("identical docs get identical MinHash signatures and bands") {
    val banded = DedupOps.withMinHashBands(docs, "text")
    val rows = banded.filter(col("doc_id") <= 1)
      .select("minhash_sig", "band_0", "band_1", "band_2", "band_3").collect()
    assert(rows(0) == rows(1))
  }

  test("short doc (< n tokens) gets null signature") {
    val d = Seq((0L, "too short")).toDF("doc_id", "text")
    val sig = DedupOps.withMinHashBands(d, "text").select("minhash_sig").head()
    assert(sig.isNullAt(0))
  }

  test("MinHash LSH finds exact+near dup pairs, not unrelated ones") {
    val pairs = DedupOps.minHashDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), "exact dup pair must survive")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)), "near dup must survive")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L),
      "unrelated docs must not pair at threshold 0.5")
  }

  test("minHashSignature column API matches the DataFrame path") {
    val viaCol = docs.select(DedupOps.minHashSignature(col("text")).as("s"))
      .collect().map(_.get(0))
    val viaDf = DedupOps.withMinHashBands(docs, "text")
      .select(col("minhash_sig").as("s")).collect().map(_.get(0))
    assert(viaCol.toSeq == viaDf.toSeq)
  }

  test("identical docs share all SimHash bands; near-dups share at least one") {
    val banded = DedupOps.withSimHashBands(docs, "text")
      .select(col("doc_id"), col("simhash_bands")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(banded(0L) == banded(1L))
    assert(banded(0L).intersect(banded(2L)).nonEmpty)
  }

  test("SimHash candidate pairs include planted dups") {
    val pairs = DedupOps.simHashCandidatePairs(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)))
  }

  test("ngramJaccardPairs computes exact jaccard on a hand-checked case") {
    // A: tokens a b c d -> shingles {a b c, b c d}; B: a b c e -> {a b c, b c e}
    // shared=1, union=3 -> jaccard = 1/3
    val d = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val rows = DedupOps.ngramJaccardPairs(d, "doc_id", "text", threshold = 0.0)
      .collect()
    assert(rows.length == 1)
    assert(math.abs(rows.head.getAs[Double]("jaccard") - 1.0 / 3.0) < 1e-12)
  }

  test("ngramJaccardPairsCloneCollapsed equals the plain operator bit-for-bit") {
    // the 100x-campaign reformulation (PERF_NOTES r17): clone groups
    // (3 copies + 2 copies), a cross-group near-dup pair, zero-shingle
    // duplicated docs (< 3 tokens — must NOT pair), an unrelated
    // singleton, and clone ids interleaved so least/greatest ordering
    // in the expansion is actually exercised
    val d = Seq(
      (1L, "a b c d e"), (7L, "a b c d e"), (4L, "a b c d e"),
      (2L, "a b c e f"), (9L, "a b c e f"),
      (3L, "x y"), (8L, "x y"),
      (5L, "q r s t u v w")).toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    for (t <- Seq(0.0, 0.05, 0.5, 1.0)) {
      val plain = norm(DedupOps.ngramJaccardPairs(d, "doc_id", "text", t))
      val fast = norm(DedupOps.ngramJaccardPairsCloneCollapsed(
        d, "doc_id", "text", t))
      assert(fast == plain, s"threshold $t: $fast != $plain")
    }
    // sanity on the shape itself: within-group pairs present at 1.0,
    // zero-shingle dups absent
    val rows = norm(DedupOps.ngramJaccardPairsCloneCollapsed(
      d, "doc_id", "text", 0.05))
    assert(rows.contains((1L, 4L, 1.0)) && rows.contains((4L, 7L, 1.0)))
    assert(!rows.exists(r => r._1 == 3L || r._2 == 8L))
    // adaptive fallback: a mostly-unique corpus (ratio >= collapseBelow)
    // routes to the plain operator — same rows by construction; pin it
    // by forcing the threshold both ways on the same input
    val forcedPlain = norm(DedupOps.ngramJaccardPairsCloneCollapsed(
      d, "doc_id", "text", 0.05, collapseBelow = 0.0))
    assert(forcedPlain == rows)
  }

  test("bfs edge build: clone-collapsed pairs give identical BFS levels (and star edges would not)") {
    // q_bfs_levels' edge stage (r19): the SYMMETRIZED clone-collapsed
    // pair frame must equal the plain builder's — BFS levels are a path
    // METRIC, so unlike the CC consumers the query cannot ride
    // connectivity-mode star edges (dist(b,c) inside a clone clique is
    // 1 all-pairs but 2 via the star). Pin both facts: collapsed ≡
    // plain end-to-end through bfsLevels, and the star edge set is NOT
    // a valid substitute on this fixture.
    val d = Seq(
      (1L, "a b c d e"), (7L, "a b c d e"), (4L, "a b c d e"),
      (2L, "a b c e f"), (9L, "a b c e f"),
      (5L, "q r s t u v w")).toDF("doc_id", "text")
    def sym(p: org.apache.spark.sql.DataFrame) =
      p.select(col("id_a"), col("id_b")).unionByName(
        p.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    def edgeSet(p: org.apache.spark.sql.DataFrame) = sym(p).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val plainPairs = DedupOps.ngramJaccardPairs(d, "doc_id", "text", 0.05)
    val collPairs = DedupOps.ngramJaccardPairsCloneCollapsed(
      d, "doc_id", "text", 0.05, collapseBelow = 1.1) // force collapse
    assert(edgeSet(collPairs) == edgeSet(plainPairs))
    def levels(p: org.apache.spark.sql.DataFrame) =
      graft.operators.GraphOps.bfsLevels(sym(p), source = 4L, maxDepth = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(levels(collPairs) == levels(plainPairs))
    // the star substitute changes the metric: 4→7 is 1 hop all-pairs
    // (both clones of gid 1) but 2 hops through the gid=1 star
    val starLevels = levels(DedupOps.ngramJaccardConnectivityEdges(
      d, "doc_id", "text", 0.05, collapseBelow = 1.1))
    assert(starLevels != levels(plainPairs),
      "star edges preserved BFS levels on a fixture built to break them — fixture no longer pins the metric difference")
  }

  test("ngramJaccardConnectivityEdges: same connected components as all-pairs, every edge genuine") {
    // same fixture as the clone-collapse test: clone groups (3 + 2
    // copies), a cross-group near-dup pair, zero-shingle dups, a
    // singleton — plus interleaved ids so the gid = min invariant is
    // exercised
    val d = Seq(
      (1L, "a b c d e"), (7L, "a b c d e"), (4L, "a b c d e"),
      (2L, "a b c e f"), (9L, "a b c e f"),
      (3L, "x y"), (8L, "x y"),
      (5L, "q r s t u v w")).toDF("doc_id", "text")
    def clusters(pairs: org.apache.spark.sql.DataFrame) =
      graft.operators.GraphOps.dupClusters(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    for (t <- Seq(0.0, 0.05, 0.5, 1.0)) {
      val allPairs = DedupOps.ngramJaccardPairs(d, "doc_id", "text", t)
      val conn = DedupOps.ngramJaccardConnectivityEdges(
        d, "doc_id", "text", t, collapseBelow = 1.1) // force collapse branch
      // cluster-level equality of both modes (the r18 contract)
      assert(clusters(conn) == clusters(allPairs), s"threshold $t")
      // every connectivity edge is a genuine qualifying pair — a SUBSET
      // of the all-pairs output, bit-equal jaccards included
      val ap = allPairs.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val ce = conn.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(ce.subsetOf(ap), s"threshold $t: ${ce.diff(ap)}")
    }
    // adaptive fallback (mostly-unique input routes to the plain
    // operator, itself a valid connectivity edge set)
    val uniq = Seq((1L, "a b c d e"), (2L, "a b c e f"), (5L, "q r s t u v w"))
      .toDF("doc_id", "text")
    assert(clusters(DedupOps.ngramJaccardConnectivityEdges(
        uniq, "doc_id", "text", 0.05)) ==
      clusters(DedupOps.ngramJaccardPairs(uniq, "doc_id", "text", 0.05)))
  }

  test("prefixJaccardPairsCloneCollapsed equals the plain PPJoin bit-for-bit") {
    // identical texts share identical prefix tokens, so the collapse
    // derivation (rep-level PPJoin + expansion) must reproduce the
    // plain operator's pair set exactly — same fixture as the plain
    // clone-collapse test, PPJoin-ish thresholds
    val d = Seq(
      (1L, "a b c d e"), (7L, "a b c d e"), (4L, "a b c d e"),
      (2L, "a b c e f"), (9L, "a b c e f"),
      (3L, "x y"), (8L, "x y"),
      (5L, "q r s t u v w")).toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    for (t <- Seq(0.3, 0.5, 1.0)) {
      val plain = norm(DedupOps.prefixJaccardPairs(d, "doc_id", "text", t))
      val fast = norm(DedupOps.prefixJaccardPairsCloneCollapsed(
        d, "doc_id", "text", t, collapseBelow = 1.1)) // force collapse
      assert(fast == plain, s"threshold $t: $fast != $plain")
      // and the adaptive fallback path routes to the plain operator
      val fb = norm(DedupOps.prefixJaccardPairsCloneCollapsed(
        d, "doc_id", "text", t, collapseBelow = 0.0))
      assert(fb == plain, s"threshold $t fallback")
    }
  }

  test("containmentPairsCloneCollapsed equals the plain operator bit-for-bit (directed)") {
    // clone groups over texts long enough to clear minShingles, a
    // strict-subset pair (directed asymmetry exercised), zero-shingle
    // dups, a singleton
    val d = Seq(
      (1L, "a b c d e f g"), (7L, "a b c d e f g"), (4L, "a b c d e f g"),
      (2L, "a b c d e f g h i j"), (9L, "a b c d e f g h i j"),
      (3L, "x y"), (8L, "x y"),
      (5L, "q r s t u v w z k l")).toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val plain = norm(DedupOps.containmentPairs(
        d, "doc_id", "text", t, n = 3, minShingles = 4))
      val fast = norm(DedupOps.containmentPairsCloneCollapsed(
        d, "doc_id", "text", t, n = 3, minShingles = 4,
        collapseBelow = 1.1)) // force collapse
      assert(fast == plain, s"threshold $t: $fast != $plain")
      val fb = norm(DedupOps.containmentPairsCloneCollapsed(
        d, "doc_id", "text", t, n = 3, minShingles = 4,
        collapseBelow = 0.0)) // force fallback
      assert(fb == plain, s"threshold $t fallback")
    }
    // directed sanity: the short group IS contained in the long group
    // (containment 1.0 each way a→b only)
    val rows = norm(DedupOps.containmentPairsCloneCollapsed(
      d, "doc_id", "text", 0.9, n = 3, minShingles = 4, collapseBelow = 1.1))
    assert(rows.exists(r => r._1 == 1L && r._2 == 2L && r._5 == 1.0))
    assert(!rows.exists(r => r._1 == 2L && r._2 == 1L))
  }

  test("graft_dup_clusters TVF: clusters and dedup modes match the operator path") {
    val d = Seq(
      (1L, "a b c d e"), (7L, "a b c d e"), (4L, "a b c d e"),
      (2L, "a b c e f"), (9L, "a b c e f"),
      (5L, "q r s t u v w")).toDF("doc_id", "text")
    d.createOrReplaceTempView("tvf_dupc")
    val viaTvf = spark.sql(
      "SELECT * FROM graft_dup_clusters('tvf_dupc', 'doc_id', 'text', 0.3) ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val direct = graft.operators.GraphOps.dupClusters(
        DedupOps.ngramJaccardConnectivityEdges(d, "doc_id", "text", 0.3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaTvf == direct && viaTvf.nonEmpty)
    // dedup mode: the full table minus non-canonical cluster members
    val survivors = spark.sql(
      "SELECT doc_id FROM graft_dup_clusters('tvf_dupc', 'doc_id', 'text', 0.3, 'dedup') ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    val losers = direct.collect { case (id, c) if id != c => id }.toSet
    assert(survivors ==
      d.collect().map(_.getLong(0)).filterNot(losers).sorted.toSeq)
    // argument validation: bad mode, non-numeric / out-of-range threshold
    intercept[IllegalArgumentException](spark.sql(
      "SELECT * FROM graft_dup_clusters('tvf_dupc', 'doc_id', 'text', 0.3, 'nope')").collect())
    intercept[IllegalArgumentException](spark.sql(
      "SELECT * FROM graft_dup_clusters('tvf_dupc', 'doc_id', 'text', 'abc')").collect())
    intercept[IllegalArgumentException](spark.sql(
      "SELECT * FROM graft_dup_clusters('tvf_dupc', 'doc_id', 'text', 1.5)").collect())
  }

  test("ngramJaccardConnectivityEdges: 10^4-copy mega-group is group-linear, not quadratic") {
    // the r17 verdict's named 100 TB killer: a boilerplate clone group
    // of g members emits g·(g−1)/2 within-group edges under the
    // all-pairs contract (5·10^7 here, ~5·10^11 at a web-scale 10^6
    // group) — connectivity mode emits exactly g−1 star edges plus the
    // rep-level cross pairs, so the edge build is linear in group size
    val g = 10000
    val clones = (1 to g).map(i => (i.toLong, "the same boilerplate text repeated"))
    val extra = Seq((20001L, "the same boilerplate text duplicated"), // near-dup of the group text
      (20002L, "completely unrelated content lives here today"))
    val d = (clones ++ extra).toDF("doc_id", "text")
    val edges = DedupOps.ngramJaccardConnectivityEdges(
      d, "doc_id", "text", threshold = 0.3)
    val n = edges.count()
    // g−1 stars + 1 rep-level cross edge (rep 1 vs doc 20001)
    assert(n == (g - 1) + 1, s"expected ${g} edges, got $n")
    // and the components still merge the whole group with its near-dup
    val cl = graft.operators.GraphOps.dupClusters(edges)
      .agg(countDistinct(col("cluster_id")), count(lit(1))).head()
    assert(cl.getLong(0) == 1L && cl.getLong(1) == (g + 1L))
  }

  test("containmentPairs: embedded doc scores 1.0 toward its container, not vice versa") {
    // A's shingle set is a strict subset of B's (B = A + suffix):
    // containment(A in B) = 1.0; containment(B in A) = |A∩B|/|B| < 1.
    // C shares nothing above threshold.
    val d = Seq(
      (1L, "a b c d e f"), // 4 shingles
      (2L, "a b c d e f g h i j"), // 8 shingles, contains all of A's
      (3L, "x y z w v u t s r q")).toDF("doc_id", "text")
    val rows = DedupOps.containmentPairs(d, "doc_id", "text",
      threshold = 0.9, minShingles = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("containment"))).toSet
    assert(rows == Set((1L, 2L, 1.0)))
    // at a looser threshold the reverse direction appears with 4/8
    val loose = DedupOps.containmentPairs(d, "doc_id", "text",
      threshold = 0.5, minShingles = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("containment"))).toSet
    assert(loose == Set((1L, 2L, 1.0), (2L, 1L, 0.5)))
  }

  test("junk-bucket cap drops flooded LSH buckets, keeps small ones") {
    // 12 clones of base share every band -> four buckets of size 12;
    // the two distinct docs land in singleton buckets. cap=5 skips the
    // flooded buckets entirely and invents nothing else.
    val flood = (0L until 12L).map(i => (i, base)) ++
      Seq((20L, distinct1), (21L, distinct2))
    val df = flood.toDF("doc_id", "text")
    val banded = DedupOps.withMinHashBands(df, "text")
    val exact = DedupOps.minHashCandidatePairsFromBanded(banded, "doc_id")
    val capped = DedupOps.minHashCandidatePairsFromBanded(banded, "doc_id",
      maxBucket = Some(5))
    assert(exact.count() == 12L * 11 / 2) // all clone pairs
    assert(capped.count() == 0) // flooded buckets skipped entirely
  }

  test("stop-shingle cap prunes high-doc-freq shingles but keeps rare-overlap pairs") {
    // doc pair (0,1) overlaps ONLY on a ubiquitous shingle (in every
    // doc); pair (2,3) overlaps on a rare one. cap=3 of 6 docs kills the
    // ubiquitous-only pair, keeps the rare pair.
    val common = "alpha beta gamma" // shingle present in all 6 docs
    val docs6 = Seq(
      (0L, s"$common one two three four"),
      (1L, s"$common five six seven eight"),
      (2L, s"$common rare pair shingle nine"),
      (3L, s"$common rare pair shingle ten"),
      (4L, s"$common eleven twelve thirteen fourteen"),
      (5L, s"$common fifteen sixteen seventeen eighteen")
    ).toDF("doc_id", "text")
    val exact = DedupOps.ngramJaccardPairs(docs6, "doc_id", "text",
      threshold = 0.01, n = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val pruned = DedupOps.ngramJaccardPairs(docs6, "doc_id", "text",
      threshold = 0.01, n = 3, maxDocFreq = Some(3))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.contains((0L, 1L)) && exact.contains((2L, 3L)))
    assert(!pruned.contains((0L, 1L))) // overlap was stop-shingles only
    assert(pruned.contains((2L, 3L))) // rare overlap survives
  }

  test("embeddingNearDupPairs finds planted identical vectors via LSH buckets") {
    val v1 = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val v2 = v1.clone()
    val v3 = Array.tabulate(64)(i => math.cos(3 * i + 2).toFloat)
    val d = Seq((1L, v1.toSeq), (2L, v2.toSeq), (3L, v3.toSeq))
      .toDF("vec_id", "embedding")
    val pairs = DedupOps.embeddingNearDupPairs(d, "vec_id", "embedding",
      threshold = 0.95, bits = 4, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("semDedup drops planted semantic dups, keeps min-id representative") {
    // 40 seeded-Gaussian vectors (pairwise cos ~ N(0, 1/64) — nowhere
    // near threshold) + two planted near-copies of vector 1 with HIGHER
    // ids (tiny perturbation -> cosine ~0.9999, same nearest cell).
    def gauss(seed: Long): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(64)(r.nextGaussian())
    }
    val corpus = (1L to 40L).map(id => (id, gauss(id)))
    val copies = Seq(41L, 42L).map { id =>
      (id, gauss(1L).zipWithIndex.map { case (x, i) => x + 1e-4 * i })
    }
    val d = (corpus ++ copies).toDF("vec_id", "embedding")

    val survivors = DedupOps.semDedup(d, "vec_id", "embedding",
      threshold = 0.99, nlist = 4)
      .select("id").as[Long].collect().toSet

    // both planted copies lose to id 1; every original is distinct
    // enough (cos << 0.99) to survive
    assert(survivors == (1L to 40L).toSet)

    // invariant: no surviving pair in the same cell is above threshold
    val cells = DedupOps.semDedup(d, "vec_id", "embedding",
      threshold = 0.99, nlist = 4)
      .as[(Long, Int)].collect().groupBy(_._2).values
    val vecs = d.as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    for (cell <- cells; Array((ia, _), (ib, _)) <- cell.combinations(2))
      assert(cos(vecs(ia), vecs(ib)) < 0.99, s"surviving pair ($ia,$ib) above threshold")
  }

  test("repeatedSpans merges planted cross-doc and within-doc duplicated grams") {
    val docs = Seq(
      // docs 1/2 share the 6-token run s1..s6: overlapping duplicated
      // 4-grams must merge into ONE span of 6 tokens in each doc
      (1L, "u1 u2 s1 s2 s3 s4 s5 s6 u3 u4"),
      (2L, "v1 v2 v3 s1 s2 s3 s4 s5 s6 v4"),
      (3L, "w1 w2 w3 w4 w5"), // unique -> zero everywhere
      // doc 4 repeats its own 4-token phrase: two disjoint spans
      (4L, "x1 r1 r2 r3 r4 x2 x3 x4 x5 r1 r2 r3 r4 x6"),
      (5L, "y1 y2")) // shorter than L: no grams at all
      .toDF("doc_id", "text")
    val out = graft.queries.TextQueries.repeatedSpans(docs, 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((10L, 3L, 1L, 0.6)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((10L, 3L, 1L, 0.6)), s"doc2: ${out(2L)}")
    assert(out(3L) == ((5L, 0L, 0L, 0.0)), s"doc3: ${out(3L)}")
    assert(out(4L) == ((14L, 2L, 2L, 0.571429)), s"doc4: ${out(4L)}")
    assert(out(5L) == ((2L, 0L, 0L, 0.0)), s"doc5: ${out(5L)}")

    // the excision twin on the same corpus: spans cut, survivors hashed
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ex = graft.queries.TextQueries.exciseRepeatedSpans(docs, 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))).toMap
    assert(ex(1L) == ((10L, 6L, h("u1 u2 u3 u4"), 0.4)), s"doc1: ${ex(1L)}")
    assert(ex(2L) == ((10L, 6L, h("v1 v2 v3 v4"), 0.4)), s"doc2: ${ex(2L)}")
    assert(ex(3L) == ((5L, 0L, h("w1 w2 w3 w4 w5"), 1.0)), s"doc3: ${ex(3L)}")
    assert(ex(4L) == ((14L, 8L, h("x1 x2 x3 x4 x5 x6"), 0.428571)),
      s"doc4: ${ex(4L)}")
    assert(ex(5L) == ((2L, 0L, h("y1 y2"), 1.0)), s"doc5: ${ex(5L)}")
  }

  test("contamination excision: planted benchmark span cut from corpus") {
    // doc 0 (id%50==0) is the benchmark; doc 1 quotes its 4-gram
    // "b1 b2 b3 b4" mid-document; doc 2 is clean (and too short for
    // grams — must pass through untouched, not vanish)
    val docs = Seq(
      (0L, "b1 b2 b3 b4 x9"),
      (1L, "a1 b1 b2 b3 b4 a2 a3"),
      (2L, "c1 c2 c3")
    ).toDF("doc_id", "text")
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = graft.queries.TextQueries.exciseContaminatedSpans(docs, 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set(1L, 2L)) // bench doc excluded from output
    assert(out(1L) == ((7L, 4L, h("a1 a2 a3"), 0.428571)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((3L, 0L, h("c1 c2 c3"), 1.0)), s"doc2: ${out(2L)}")
  }

  test("bcubed: hand-computed contingency on a planted clustering") {
    // gold {1,2},{3},{4,5,6}; pred {1,2,3},{4},{5,6}
    // per-doc P = (2/3,2/3,1/3,1,1,1) -> avg 7/9; R = (1,1,1,1/3,2/3,2/3)
    // -> avg 7/9; F1 = (4/5,4/5,1/2,1/2,4/5,4/5) -> avg 0.7
    val assign = Seq(
      (1L, 10L, 100L), (2L, 10L, 100L), (3L, 10L, 200L),
      (4L, 20L, 300L), (5L, 30L, 300L), (6L, 30L, 300L)
    ).toDF("doc_id", "c", "g").select(col("c"), col("g"))
    val r = DedupOps.bcubed(assign).collect()(0)
    assert(r.getLong(0) == 6L)   // n_docs
    assert(r.getLong(1) == 3L)   // n_pred
    assert(r.getLong(2) == 3L)   // n_gold
    assert(r.getDouble(3) == 0.777778)
    assert(r.getDouble(4) == 0.777778)
    assert(r.getDouble(5) == 0.7)
  }
}
