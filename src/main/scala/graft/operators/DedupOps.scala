package graft.operators

import graft.functions.{TextOps, VectorOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact (hash group-by), MinHash+LSH banding, SimHash,
  * n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every variant reduces to `groupBy(key)` / `join(key)`
  * where the key is a content hash / band / bucket — i.e. one shuffle
  * keyed on something small, never an all-pairs comparison. All hashing
  * is column-expression only (xxhash64 / md5), so signatures are computed
  * map-side in codegen during the scan.
  */
object DedupOps {

  /** Exact dedup groups over a (normalized) content column. One hash
    * aggregate: map-side partial, single shuffle on the content hash.
    * Grouping by the md5 (not the full text) keeps shuffle rows narrow —
    * at 100 TB you shuffle 16-byte digests, not documents.
    */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(TextOps.normText(col(textCol))).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** df minus all-but-first of each exact-duplicate group. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(TextOps.normText(col(textCol)))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** SQL table-valued surface, registered as `graft_dedup` (same
    * injection path as `graft_asof` — see
    * [[graft.plans.NativeAsOfJoin.sqlBuilder]]):
    *
    * {{{
    * SELECT * FROM graft_dedup('docs', 'doc_id', 'text')           -- groups
    * SELECT * FROM graft_dedup('docs', 'doc_id', 'text', 'dedup')  -- survivors
    * }}}
    *
    * Mode 'groups' (default) returns (text_hash, n_copies, keep_id) —
    * the exact-dup audit frame; 'dedup' returns the input table minus
    * all-but-first of each exact-duplicate group.
    */
  def sqlBuilder(
      es: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    def lit(i: Int, what: String): String =
      graft.plans.TvfArgs.strLit("graft_dedup", es)(i, what)
    if (es.size < 3 || es.size > 4)
      throw new IllegalArgumentException(
        "graft_dedup(table, id_col, text_col[, 'groups'|'dedup'])")
    val spark = org.apache.spark.sql.SparkSession.active
    val df = spark.table(lit(0, "table name"))
    // ANALYSIS-TIME rejection (the graft_asof Merge-rejection pattern):
    // both modes rank inside an id-ordered window, which Structured
    // Streaming cannot evaluate incrementally — fail here with the
    // streaming alternative instead of deep in the unsupported-
    // operation checker at stream start
    if (df.isStreaming)
      throw new UnsupportedOperationException(
        "graft_dedup: the input table is a stream — exact-dup groups " +
          "need an id-ordered window no stream can evaluate. Use " +
          "StreamingOps.ttlDedupStream (watermark-TTL'd exact dedup) " +
          "for streaming ingestion")
    val (idCol, textCol) = (lit(1, "id_col"), lit(2, "text_col"))
    val out = (if (es.size > 3) lit(3, "mode") else "groups") match {
      case "" | "groups" => exactDupGroups(df, idCol, textCol)
      case "dedup" => exactDedup(df, idCol, textCol)
      case m => throw new IllegalArgumentException(
        s"graft_dedup: mode must be groups|dedup, got '$m'")
    }
    out.queryExecution.analyzed
  }

  /** SQL table-valued surface for the NEAR-dup clustering tier,
    * registered as `graft_dup_clusters` (same injection path as
    * `graft_dedup`):
    *
    * {{{
    * SELECT * FROM graft_dup_clusters('docs', 'doc_id', 'text', 0.05)
    *   -- (doc_id, cluster_id) per clustered doc
    * SELECT * FROM graft_dup_clusters('docs', 'doc_id', 'text', 0.05, 'dedup')
    *   -- the input table minus all-but-canonical of each cluster
    * }}}
    *
    * Mode 'clusters' (default) returns the connected components of the
    * exact n-gram Jaccard graph at `threshold` (cluster_id = min member
    * id — the q_dup_clusters semantics); 'dedup' returns the full
    * near-dedup pass (q_dedup_full's shape: every non-canonical cluster
    * member anti-joined away). The edge stage is
    * [[ngramJaccardConnectivityEdges]] — clone-group linear, the
    * 100 TB path.
    */
  def clustersSqlBuilder(
      es: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    def lit(i: Int, what: String): String =
      graft.plans.TvfArgs.strLit("graft_dup_clusters", es)(i, what)
    if (es.size < 4 || es.size > 5)
      throw new IllegalArgumentException(
        "graft_dup_clusters(table, id_col, text_col, threshold" +
          "[, 'clusters'|'dedup'])")
    val spark = org.apache.spark.sql.SparkSession.active
    val df = spark.table(lit(0, "table name"))
    // ANALYSIS-TIME rejection (the graft_dedup pattern): connected
    // components are a multi-pass fixed point no stream evaluates
    if (df.isStreaming)
      throw new UnsupportedOperationException(
        "graft_dup_clusters: the input table is a stream — connected " +
          "components need a multi-pass fixed point. Use " +
          "StreamingOps.incrementalCC for streaming clustering or " +
          "ttlDedupStream for streaming dedup")
    val (idCol, textCol) = (lit(1, "id_col"), lit(2, "text_col"))
    val threshold = {
      val raw = lit(3, "threshold")
      val t = try raw.toDouble catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft_dup_clusters: threshold must be numeric, got '$raw'")
      }
      require(t > 0.0 && t <= 1.0,
        s"graft_dup_clusters: threshold must be in (0, 1], got $t")
      t
    }
    val edges = ngramJaccardConnectivityEdges(df, idCol, textCol, threshold)
    val clusters = GraphOps.dupClusters(edges)
    val out = (if (es.size > 4) lit(4, "mode") else "clusters") match {
      case "" | "clusters" =>
        clusters.select(col("id").as(idCol), col("cluster_id"))
      case "dedup" =>
        df.join(clusters.filter(col("id") =!= col("cluster_id"))
          .select(col("id").as(idCol)), Seq(idCol), "left_anti")
      case m => throw new IllegalArgumentException(
        s"graft_dup_clusters: mode must be clusters|dedup, got '$m'")
    }
    out.queryExecution.analyzed
  }

  /** SQL table-valued surface for the SemDeDup tier, registered as
    * `graft_semdedup` (same injection path as `graft_dedup`):
    *
    * {{{
    * SELECT * FROM graft_semdedup('vecs', 'vec_id', 'embedding', 0.3)
    *   -- survivors (vec_id, cell)
    * SELECT * FROM graft_semdedup('vecs', 'vec_id', 'embedding', 0.3, 128)
    *   -- explicit nlist (0/omitted = auto ~256-vector cells)
    * }}}
    *
    * Returns [[semDedup]]'s survivors: (id column under its own name,
    * cell). Streaming inputs are rejected at ANALYSIS time (the
    * graft_dedup pattern) — the in-cell pair join and the distinct are
    * multi-pass; streaming semantic dedup is StreamingOps territory.
    */
  def semDedupSqlBuilder(
      es: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    def lit(i: Int, what: String): String =
      graft.plans.TvfArgs.strLit("graft_semdedup", es)(i, what)
    if (es.size < 4 || es.size > 5)
      throw new IllegalArgumentException(
        "graft_semdedup(table, id_col, vec_col, threshold[, nlist])")
    val spark = org.apache.spark.sql.SparkSession.active
    val df = spark.table(lit(0, "table name"))
    if (df.isStreaming)
      throw new UnsupportedOperationException(
        "graft_semdedup: the input table is a stream — in-cell pair " +
          "comparison is a multi-pass join no stream can evaluate. Use " +
          "StreamingOps.annTopKStream (stream-static probe of a " +
          "persisted index) for streaming semantic admission")
    val (idCol, vecCol) = (lit(1, "id_col"), lit(2, "vec_col"))
    val threshold = {
      val raw = lit(3, "threshold")
      val t = try raw.toDouble catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft_semdedup: threshold must be numeric, got '$raw'")
      }
      require(t >= -1.0 && t <= 1.0,
        s"graft_semdedup: threshold must be a cosine in [-1, 1], got $t")
      t
    }
    val nlist =
      if (es.size > 4) {
        val raw = lit(4, "nlist")
        try raw.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"graft_semdedup: nlist must be an integer, got '$raw'")
        }
      } else 0
    val out = semDedup(df, idCol, vecCol, threshold, nlist)
      .withColumnRenamed("id", idCol)
    out.queryExecution.analyzed
  }

  /** [[containmentPairs]] with the exact-duplicate collapse — the
    * directed sibling of [[prefixJaccardPairsCloneCollapsed]]: identical
    * texts have identical shingle sets, so every qualifying ORDERED doc
    * pair is the expansion of a qualifying ordered TEXT-GROUP pair
    * (cross pairs inherit the reps' n_shared/n_a/containment verbatim;
    * within a group of n >= 2 copies with >= minShingles shingles,
    * every ordered pair at containment exactly 1 — n_shared = n_a =
    * the group's shingle count, matching the plain operator's
    * arithmetic bit for bit). Same adaptive fallback and the same
    * no-maxDocFreq rule as the Jaccard collapse (document frequency
    * counts clones there but groups here).
    */
  def containmentPairsCloneCollapsed(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3, minShingles: Int = 5,
      collapseBelow: Double = 0.9): DataFrame = {
    val groups = df.select(col(idCol).as("id"), md5(col(textCol)).as("__h"))
      .groupBy(col("__h"))
      .agg(min(col("id")).as("gid"), count(lit(1)).as("__n"))
      .localCheckpoint()
    val stats = groups.agg(count(lit(1)), sum(col("__n"))).head()
    val nTexts = stats.getLong(0)
    val nDocs = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    if (nDocs == 0L || nTexts >= collapseBelow * nDocs)
      return containmentPairs(df, idCol, textCol, threshold, n, minShingles)
    val members = df.select(col(idCol).as("id"), md5(col(textCol)).as("__h"))
      .join(groups.select(col("__h"), col("gid")), Seq("__h"))
      .select(col("gid"), col("id"))
    val reps = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .join(groups.select(col("gid").as("id")), Seq("id"), "left_semi")
      .localCheckpoint()
    val gp = containmentPairs(reps, "id", "__text", threshold, n, minShingles)
    // DIRECTED expansion: id_a stays the contained side
    val cross = gp
      .join(members.select(col("gid").as("id_a"), col("id").as("__da")), "id_a")
      .join(members.select(col("gid").as("id_b"), col("id").as("__db")), "id_b")
      .select(col("__da").as("id_a"), col("__db").as("id_b"),
        col("n_shared"), col("n_a"), col("containment"))
    val repSizes = reps.select(col("id").as("gid"),
      size(call_function("graft_shingle_hashes",
        TextOps.tokens(col("__text")), lit(n), lit(42L)))
        .cast(LongType).as("__nsh"))
    val withinGroups = groups.filter(col("__n") >= 2)
      .join(repSizes.filter(col("__nsh") >= minShingles), Seq("gid"))
      .select(col("gid"), col("__nsh"))
    val wm = members.join(withinGroups, Seq("gid"))
    val within = wm.select(col("gid"), col("id").as("id_a"), col("__nsh"))
      .join(wm.select(col("gid"), col("id").as("id_b")), Seq("gid"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), col("__nsh").as("n_shared"),
        col("__nsh").as("n_a"), lit(1.0).as("containment"))
      .filter(lit(1.0) >= lit(threshold))
    cross.unionByName(within)
  }

  /** k-permutation MinHash signature over word n-gram shingles of
    * `textCol` — the native codegen'd [[graft.functions.MinHashSignature]]
    * expression: one pass, one hash per token, shingle hashes chained
    * from token hashes (no n-gram strings materialized), all k
    * permutation minima in a tight loop. Docs shorter than n words get
    * null. (The HOF fold formulation took ~6 s at sf0.1; this is ~10x
    * cheaper and allocation-free per shingle.)
    */
  def minHashSignature(textCol: Column, k: Int = 16, n: Int = 3, seed: Long = 42L): Column =
    call_function("graft_minhash", TextOps.tokens(textCol), lit(k), lit(n), lit(seed))

  /** Adds `minhash_sig` plus `bands` band-hash columns (`band_0`..).
    * Two docs collide on a band iff that band's signature rows all match —
    * the classic LSH amplification: P(candidate) = 1-(1-j^r)^b.
    */
  def withMinHashBands(
      df: DataFrame, textCol: String,
      k: Int = 16, bands: Int = 4, n: Int = 3, seed: Long = 42L): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    // own projection step so band slices read a computed column
    val withSig = df
      .withColumn("minhash_sig", minHashSignature(col(textCol), k, n, seed))
    (0 until bands).foldLeft(withSig) { (d, bIdx) =>
      d.withColumn(s"band_$bIdx",
        xxhash64(concat_ws(",", slice(col("minhash_sig"), bIdx * r + 1, r).cast(ArrayType(StringType)))))
    }
  }

  /** LSH candidate pairs: explode (band index, band hash), self-join on
    * the bucket, keep each unordered pair once. The join shuffles on
    * (band, hash) — candidates never leave their bucket, so cost tracks
    * the number of colliding docs, not |corpus|^2.
    */
  def minHashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, n: Int = 3, seed: Long = 42L): DataFrame =
    minHashCandidatePairsFromBanded(
      withMinHashBands(df, textCol, k, bands, n, seed), idCol, bands)

  /** Candidate pairs from an already-banded frame (signatures are the
    * expensive half — callers that also keep the bands should compute
    * them once via [[withMinHashBands]] and pass the result here).
    *
    * @param maxBucket junk-bucket cutoff: band buckets holding more than
    *                   this many docs are skipped entirely. A bucket of m
    *                   docs emits m^2/2 candidates, so one degenerate
    *                   bucket (boilerplate, clone floods — ScaleSmoke
    *                   measured 13x on a clone-saturated corpus) can
    *                   dominate the whole job; production LSH dedup always
    *                   caps it. None = exact behavior (every candidate).
    */
  def minHashCandidatePairsFromBanded(
      bandedDf: DataFrame, idCol: String, bands: Int = 4,
      maxBucket: Option[Int] = None): DataFrame = {
    val banded = bandedDf
      .filter(col("minhash_sig").isNotNull)
      .select(col(idCol), posexplode(array((0 until bands).map(i => col(s"band_$i")): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
    val kept = maxBucket match {
      case None => banded
      case Some(cap) =>
        // one extra narrow agg on the same key the join shuffles on —
        // the bucket sizes reuse the exchange, so the cap is ~free
        val sizes = banded.groupBy(col("band"), col("band_hash"))
          .agg(count(lit(1)).as("__bucket_n"))
          .filter(col("__bucket_n") <= cap)
        banded.join(sizes, Seq("band", "band_hash")).drop("__bucket_n")
    }
    val a = kept.select(col("band"), col("band_hash"), col(idCol).as("id_a"))
    val b = kept.select(col("band"), col("band_hash"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "band_hash")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** MinHash near-dup pairs: LSH candidates verified with exact Jaccard
    * over distinct shingle sets (computed only for candidates).
    */
  def minHashDupPairs(
      df: DataFrame, idCol: String, textCol: String, threshold: Double,
      k: Int = 16, bands: Int = 4, n: Int = 3, seed: Long = 42L): DataFrame = {
    val cands = minHashCandidatePairs(df, idCol, textCol, k, bands, n, seed)
    val sets = df.select(col(idCol), array_distinct(TextOps.shingles(col(textCol), n)).as("sh"))
    cands
      .join(sets.withColumnsRenamed(Map(idCol -> "id_a", "sh" -> "sh_a")), "id_a")
      .join(sets.withColumnsRenamed(Map(idCol -> "id_b", "sh" -> "sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Full 64-bit SimHash of the word tokens as one long — the native
    * codegen'd [[graft.functions.SimHash64]] expression (one xxhash64 per
    * token, tight bit loop; the HOF formulation costs 64 interpreted
    * lambda evals per token and took 153 s at sf0.1).
    */
  def simHash64(textCol: Column): Column =
    call_function("graft_simhash64", TextOps.tokens(textCol))

  /** Splits a 64-bit SimHash into `bandsN` band values (16-bit chunks at
    * bandsN=4, MSB-first) for Hamming LSH: docs within Hamming distance
    * bandsN-1 of each other must share at least one band exactly.
    */
  def simHashBandsFromHash(simCol: Column, bandsN: Int = 4): Column = {
    val bitsPerBand = 64 / bandsN
    val mask = (1L << bitsPerBand) - 1
    array((0 until bandsN).map { b =>
      shiftrightunsigned(simCol, (bandsN - 1 - b) * bitsPerBand) bitwiseAND mask
    }: _*)
  }

  /** Adds a `simhash_bands` array column (two projection steps so the
    * hash is computed exactly once per row).
    */
  def withSimHashBands(df: DataFrame, textCol: String, bandsN: Int = 4): DataFrame =
    df.withColumn("__sh64", simHash64(col(textCol)))
      .withColumn("simhash_bands", simHashBandsFromHash(col("__sh64"), bandsN))
      .drop("__sh64")

  /** SimHash near-dup candidate pairs via band collision (Hamming LSH). */
  def simHashCandidatePairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = withSimHashBands(df, textCol)
      .select(col(idCol), posexplode(col("simhash_bands")))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_val"))
    val a = sig.select(col("band"), col("band_val"), col(idCol).as("id_a"))
    val b = sig.select(col("band"), col("band_val"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "band_val")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact n-gram Jaccard pairs via an inverted shingle index: explode
    * distinct shingles, self-join on the shingle (the shuffle key),
    * count shared shingles per pair, Jaccard from |A|+|B|-|shared|.
    * Unlike MinHash this is exact (at the default settings), at the cost
    * of candidate fan-out on common shingles — `maxDocFreq` is the scale
    * valve for that.
    *
    * @param maxDocFreq stop-shingle cutoff: shingles occurring in more
    *                    than this many docs are dropped from the index
    *                    (their pair fan-out is quadratic and they carry
    *                    almost no Jaccard signal — the textual analog of
    *                    a stopword). NOTE: pairs whose overlap was only
    *                    stop-shingles are missed and surviving pair
    *                    Jaccards are computed over the pruned shingle
    *                    sets, so this trades exactness for scale;
    *                    None = exact (the oracle-checked configuration).
    */
  /** (id, shs) with the native 64-bit shingle-hash kernel, fanned out to
    * core parallelism first (CoreOps.fanOut — identity at scale): the
    * kernel is the map-side cost of every similarity operator here, and
    * a byte-light single-row-group corpus scan would otherwise run it
    * on ONE task whatever the session's core count.
    */
  private def shingleHashed(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    graft.ops.CoreOps.fanOut(
        df.select(col(idCol).as("id"), col(textCol).as("__fo_text")), col("id"))
      .select(col("id"),
        call_function("graft_shingle_hashes",
          TextOps.tokens(col("__fo_text")), lit(n), lit(42L)).as("shs"))

  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3, maxDocFreq: Option[Int] = None): DataFrame = {
    // Join key is a 64-bit shingle hash, not the shingle text: the
    // self-join shuffle then moves 16-byte rows instead of full n-grams,
    // and the native ShingleHashes expression never materializes an
    // n-gram string at all (the concat_ws/transform HOF + xxhash64(str)
    // formulation cost ~6 s of the sf0.1 bench on its own). A 64-bit
    // collision would merge two shingles — odds ~ |shingles|^2 / 2^64,
    // immaterial even at 100 TB corpus scale.
    val hashed = shingleHashed(df, idCol, textCol, n)
    val shAll = hashed.select(col("id"), explode(col("shs")).as("sh"))
    val sh = maxDocFreq match {
      case None => shAll
      case Some(cap) =>
        val dfreq = shAll.groupBy(col("sh")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap)
        shAll.join(dfreq, Seq("sh")).drop("__df")
    }
    // Per-doc distinct-shingle counts: straight off the array length when
    // exact (no explode, no shuffle-side count); over the pruned index
    // when stop-shingles are dropped, so pair Jaccards stay internally
    // consistent with the pruned sets.
    val sizes = maxDocFreq match {
      case None =>
        hashed.select(col("id"), size(col("shs")).cast(LongType).as("n_sh"))
          .filter(col("n_sh") > 0)
      case Some(_) =>
        sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    }
    // (A singleton-shingle df-prune before the self-join was measured
    // and NOT kept: it helps only when most shingles are unique; on
    // corpora with repeating vocabulary the extra aggregate+join costs
    // more than it saves.)
    // (A groupBy(sh).collect_list + in-row pair-explode variant was
    // measured at 4.4 s cold vs 4.0 s for this self-join at sf0.1 — the
    // identical a/b subtrees share one exchange via ReuseExchange, and
    // the sort-merge join stays inside whole-stage codegen while
    // collect_list forces ObjectHashAggregate.)
    val shared = sh.withColumnsRenamed(Map("id" -> "id_a"))
      .join(sh.withColumnsRenamed(Map("id" -> "id_b")), "sh")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "n_sh" -> "n_a")), "id_a")
      .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "n_sh" -> "n_b")), "id_b")
      .withColumn("jaccard",
        col("n_shared").cast(DoubleType) / (col("n_a") + col("n_b") - col("n_shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** [[ngramJaccardPairs]] with exact-duplicate collapse — the SAME
    * pair set (bit-equal jaccards), derived clone-aware: identical
    * texts have identical shingle sets, so every qualifying doc pair is
    * the expansion of a qualifying TEXT-GROUP pair — cross-group pairs
    * inherit the representatives' jaccard (computed by the plain
    * operator over ONE row per distinct text), within-group pairs are
    * every member pair at jaccard exactly 1 (the plain operator's
    * n/(n+n−n); groups whose text has fewer than n tokens have no
    * shingles and never pair, there as here).
    *
    * This is the 100 TB shape for duplicate-heavy corpora: the
    * quadratic shingle self-join runs over |distinct texts| occurrence
    * lists instead of |docs| — the difference between the candidate
    * stage that exhausted this box's disk at the 100x clone corpus
    * (1.24G intermediate rows, PERF_NOTES r16) and one that finishes
    * (PERF_NOTES r17). On a mostly-unique corpus (distinct-text ratio
    * >= `collapseBelow`) it ADAPTIVELY falls back to the plain
    * operator, paying only the 16-byte-key groupBy that measured the
    * ratio — the expansion machinery is insurance, priced only when
    * duplication makes it pay. NOT offered with
    * maxDocFreq: shingle document frequency counts clones in the plain
    * operator but groups here, so the pruned variants would disagree.
    * Group identity is md5(text) — the engine's exact-dup standard
    * ([[exactDupGroups]], q_bcubed's gold truth).
    */
  def ngramJaccardPairsCloneCollapsed(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3,
      collapseBelow: Double = 0.9): DataFrame =
    cloneCollapsedImpl(df, idCol, textCol, threshold, n, collapseBelow,
      connectivity = false)

  /** Connectivity-mode near-dup EDGES: a subset of
    * [[ngramJaccardPairsCloneCollapsed]]'s pair set with exactly the
    * same CONNECTED COMPONENTS, linear in clone-group size. Within each
    * clone group the g·(g−1)/2 all-pairs clique is replaced by a
    * gid→member STAR (g−1 edges, jaccard exactly 1 — members are
    * byte-identical, so each star edge IS a genuine qualifying pair);
    * each qualifying cross-group pair is emitted ONCE at representative
    * level (gid_a, gid_b) instead of being expanded g_a·g_b ways — the
    * reps are connected to every member through the stars, so component
    * membership (and the component min, [[GraphOps.dupClusters]]'s
    * cluster_id, since gid = min member) is unchanged.
    *
    * This is the 100 TB shape for CONNECTIVITY consumers (connected
    * components, dedup-survivor selection, cluster-keyed splits): a
    * 10⁶-member boilerplate clone group emits 10⁶−1 edges here versus
    * ~5·10¹¹ from the all-pairs contract — the difference between a
    * group-linear edge build and one that cannot finish (the r17
    * verdict's last named scale-killer; DedupSpec's planted 10⁴-copy
    * mega-group pins the gap). NOT a drop-in for pair-LIST consumers
    * (q_dedup_curve's operating points, per-pair audits) or for
    * edge-multiset algorithms (label propagation counts neighbor-label
    * frequencies and is NOT clique/star invariant — see q_label_prop's
    * collapsed-graph formulation) — those keep
    * [[ngramJaccardPairsCloneCollapsed]] / [[ngramJaccardPairs]].
    *
    * Same adaptive fallback: on a mostly-unique corpus the plain pair
    * set is returned unchanged (it is itself a valid connectivity edge
    * set, and the clique machinery would be pure overhead).
    */
  def ngramJaccardConnectivityEdges(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3,
      collapseBelow: Double = 0.9): DataFrame =
    cloneCollapsedImpl(df, idCol, textCol, threshold, n, collapseBelow,
      connectivity = true)

  /** [[prefixJaccardPairs]] with the SAME exact-duplicate collapse as
    * [[ngramJaccardPairsCloneCollapsed]] — identical texts share
    * identical prefix tokens, so on a clone-heavy corpus the PPJoin
    * candidate self-join blows up exactly like the plain inverted
    * index (every clone pair collides on every prefix token); running
    * the prefix/positional machinery over ONE representative per
    * distinct text and expanding (cross pairs inherit the reps'
    * jaccard, within-group pairs are jaccard exactly 1) produces the
    * IDENTICAL pair set. The OUTPUT is still quadratic in clone-group
    * size — that is the pair-list contract — but the candidate stage,
    * the verify joins, and the shingle index are all 1x-sized.
    */
  def prefixJaccardPairsCloneCollapsed(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3,
      collapseBelow: Double = 0.9): DataFrame =
    cloneCollapsedImpl(df, idCol, textCol, threshold, n, collapseBelow,
      connectivity = false, pairFn = prefixJaccardPairs)

  private def cloneCollapsedImpl(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int,
      collapseBelow: Double, connectivity: Boolean,
      pairFn: (DataFrame, String, String, Double, Int) => DataFrame =
        ngramJaccardPairs(_, _, _, _, _, None)): DataFrame = {
    // ADAPTIVE: the collapse machinery (members join + expansion) is
    // insurance against clone-group quadratics — on a mostly-unique
    // corpus it is pure overhead. The probe shuffles ONLY (md5, id)
    // rows (16-byte keys + a long — texts never enter an exchange or a
    // checkpoint here); the decision reads two longs off the
    // |texts|-row checkpoint. Below `collapseBelow` distinct-text
    // ratio, collapse; at or above it, run the plain operator. Both
    // branches produce the SAME rows (DedupSpec pins bit-equality of
    // the collapsed branch and the fallback on the same input).
    val groups = df
      .select(col(idCol).as("id"), md5(col(textCol)).as("__h"))
      .groupBy(col("__h"))
      .agg(min(col("id")).as("gid"), count(lit(1)).as("__n"))
      .localCheckpoint()
    val stats = groups.agg(count(lit(1)), sum(col("__n"))).head()
    val nTexts = stats.getLong(0)
    val nDocs = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    if (nDocs == 0L || nTexts >= collapseBelow * nDocs)
      return pairFn(df, idCol, textCol, threshold, n)
    val members = df.select(col(idCol).as("id"), md5(col(textCol)).as("__h"))
      .join(groups.select(col("__h"), col("gid")), Seq("__h"))
      .select(col("gid"), col("id"))
    // representative texts, fetched only on the collapse branch: a semi
    // join of the corpus against the |texts|-sized gid list (broadcast
    // when small), checkpointed once because both the pair build and
    // the within-group gate read it — by the branch condition this
    // frame is at most collapseBelow x |docs| rows
    val reps = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .join(groups.select(col("gid").as("id")), Seq("id"), "left_semi")
      .localCheckpoint()
    // the plain operator over one representative row per distinct text:
    // same shingles, same counts, same double arithmetic
    val gp = pairFn(reps, "id", "__text", threshold, n)
    // within-group gate: only groups with >= 2 copies AND a non-empty
    // shingle set (>= n tokens) — zero-shingle docs never pair in the
    // plain operator either
    val withinGroups = groups.filter(col("__n") >= 2)
      .select(col("gid").as("id"))
      .join(reps.filter(size(TextOps.tokens(col("__text"))) >= n)
        .select(col("id")), Seq("id"), "left_semi")
      .select(col("id").as("gid"))
    val wm = members.join(withinGroups, Seq("gid"), "left_semi")
    if (connectivity) {
      // star expansion: gid -> member, g−1 edges per group — each a
      // genuine jaccard-1 pair (gid = min member, so id_a < id_b holds)
      val star = wm.filter(col("id") =!= col("gid"))
        .select(col("gid").as("id_a"), col("id").as("id_b"),
          lit(1.0).as("jaccard"))
        .filter(lit(1.0) >= lit(threshold))
      // cross-group pairs stay at representative level: one edge per
      // qualifying TEXT-GROUP pair — members reach their rep via stars
      gp.select(col("id_a"), col("id_b"), col("jaccard"))
        .unionByName(star)
    } else {
      val cross = gp
        .join(members.select(col("gid").as("id_a"), col("id").as("__da")), "id_a")
        .join(members.select(col("gid").as("id_b"), col("id").as("__db")), "id_b")
        .select(least(col("__da"), col("__db")).as("id_a"),
          greatest(col("__da"), col("__db")).as("id_b"), col("jaccard"))
      val within = wm.select(col("gid"), col("id").as("id_a"))
        .join(wm.select(col("gid"), col("id").as("id_b")), "gid")
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), lit(1.0).as("jaccard"))
        .filter(lit(1.0) >= lit(threshold))
      cross.unionByName(within)
    }
  }

  /** Prefix-filtered exact shingle-Jaccard pairs (the PPJoin family,
    * Xiao et al. 2008 / Chaudhuri et al. 2006): shingle hashes get a
    * GLOBAL rarity order (document frequency asc, hash asc); each set
    * indexes only its first |X| - floor(t·|X|) + 1 shingles in that
    * order, because any pair reaching Jaccard >= t must share a token
    * inside both such prefixes (prefix-filter lemma with the pairwise
    * overlap bound ceil(t·|X|) <= alpha; `floor` rather than the exact
    * `ceil` keeps the prefix one longer so an ulp of float error in
    * t·|X| can never shorten it below the sound length). Candidates
    * then pass the length filter (t·max <= min), the POSITIONAL filter
    * (PPJoin's second lemma — the first shared prefix token's positions
    * bound the reachable overlap at 1 + min(|A|−i, |B|−j), which must
    * cover t·(|A|+|B|)/(1+t); measured r18: candidate volume fell 844→28
    * at sf0.01 and 316,773→124,850 at sf0.1, PERF_NOTES) and an EXACT
    * intersection count, so the output is identical to the full
    * inverted-index join — the oracle recomputes it that way,
    * independently checking the filters admit no false negatives.
    *
    * Scale shape vs [[ngramJaccardPairs]]: the self-join runs over the
    * RAREST slice of each set instead of the full index, so candidate
    * volume tracks near-duplicate density, not corpus-wide shingle
    * frequency — a stopword-ish shingle shared by millions of docs
    * lands in nobody's prefix (its df sorts it last) and never joins.
    * The two checkpointed frames bound recomputation: `sh` feeds the
    * rarity order and both verify joins; `cand` is candidate-pair
    * sized. Verification shuffles the shingle index once per side,
    * keyed on doc id — linear, never all-pairs.
    */
  def prefixJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3): DataFrame = {
    val hashed = shingleHashed(df, idCol, textCol, n)
    val sh = hashed.select(col("id"), size(col("shs")).cast(LongType).as("n_sh"),
        explode(col("shs")).as("sh"))
      .localCheckpoint()
    val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col("id")).orderBy(col("df"), col("sh"))
    val pref = sh.join(dfreq, Seq("sh"))
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= col("n_sh") - floor(col("n_sh") * lit(threshold)) + 1)
      .select(col("id"), col("sh"), col("n_sh"), col("rn"))
    // POSITIONAL filter (PPJoin's second lemma) on top of prefix +
    // length: for the FIRST shared prefix token — the lowest in the
    // global rarity order, i.e. the one minimizing BOTH sides' rank
    // (each side's prefix order is a restriction of the same global
    // order, so one token attains both minima) — no earlier token is
    // shared, hence |A∩B| <= 1 + min(|A|−i, |B|−j). Jaccard >= t needs
    // overlap >= t·(|A|+|B|)/(1+t); candidates whose positional bound
    // cannot reach that are pruned BEFORE the exact-verify join pays
    // for them. The 1e-6 slack keeps the prune conservative under fp
    // (a pair exactly at the bound is never dropped — the full-index
    // oracle independently proves zero false negatives). The groupBy
    // replaces the old DISTINCT: same dedup, plus the per-pair (i, j)
    // minima the bound needs, in the same exchange.
    val cand = pref.select(col("id").as("id_a"), col("sh"),
        col("n_sh").as("n_a"), col("rn").as("i"))
      .join(pref.select(col("id").as("id_b"), col("sh"),
        col("n_sh").as("n_b"), col("rn").as("j")), "sh")
      .filter(col("id_a") < col("id_b") &&
        least(col("n_a"), col("n_b")).cast(DoubleType) >=
          greatest(col("n_a"), col("n_b")) * lit(threshold))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("i")).as("i"), min(col("j")).as("j"),
        min(col("n_a")).as("n_a"), min(col("n_b")).as("n_b"))
      .filter((lit(1.0) + lit(threshold)) *
          (lit(1.0) + least(col("n_a") - col("i"), col("n_b") - col("j"))
            .cast(DoubleType)) >=
        lit(threshold) * (col("n_a") + col("n_b")).cast(DoubleType) - lit(1e-6))
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .localCheckpoint()
    val inter = cand
      .join(sh.select(col("id").as("id_a"), col("sh")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
    cand.join(inter, Seq("id_a", "id_b"))
      .withColumn("jaccard",
        col("n_inter").cast(DoubleType) / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Directed shingle-set CONTAINMENT pairs: |A ∩ B| / |A| >= threshold
    * for ordered pairs (A, B) — the boilerplate / subset-duplication
    * detector Jaccard misses: a short doc fully embedded in a much
    * longer one has tiny Jaccard (union is dominated by B) but
    * containment 1.0. This is the C = |A∩B|/|A| measure of Broder's
    * resemblance/containment pair ("On the resemblance and containment
    * of documents", 1997).
    *
    * Same scale shape as [[ngramJaccardPairs]]: native 64-bit shingle
    * hashes (no n-gram strings materialized), inverted-index self-join
    * on the hash, optional stop-shingle doc-frequency cap so a
    * boilerplate shingle shared by millions of docs cannot quadratic-
    * blow the join. Directed output keeps BOTH (a in b) and (b in a)
    * rows — asymmetry is the point.
    */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3, minShingles: Int = 5,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val hashed = shingleHashed(df, idCol, textCol, n)
    val shAll = hashed.select(col("id"), explode(col("shs")).as("sh"))
    val sh = maxDocFreq match {
      case None => shAll
      case Some(cap) =>
        val dfreq = shAll.groupBy(col("sh")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap)
        shAll.join(dfreq, Seq("sh")).drop("__df")
    }
    // Denominator = |A|'s distinct shingles over the SAME (possibly
    // df-pruned) index the intersection is counted on.
    val sizes = maxDocFreq match {
      case None =>
        hashed.select(col("id"), size(col("shs")).cast(LongType).as("n_sh"))
          .filter(col("n_sh") >= minShingles)
      case Some(_) =>
        sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
          .filter(col("n_sh") >= minShingles)
    }
    val shared = sh.withColumnsRenamed(Map("id" -> "id_a"))
      .join(sh.withColumnsRenamed(Map("id" -> "id_b")), "sh")
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "n_sh" -> "n_a")), "id_a")
      .withColumn("containment", col("n_shared").cast(DoubleType) / col("n_a"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_shared"), col("n_a"), col("containment"))
  }

  /** Embedding-cosine near-dup pairs, LSH-bucketed: only vectors sharing
    * a hyperplane-signature bucket are compared (single-probe; near-dups
    * at cos >= ~0.9 collide with high probability at low `bits`).
    */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val v = df.select(col(idCol).as("id"), VectorOps.toDoubleVec(col(vecCol)).as("vec"))
      .withColumn("bucket", VectorOps.hyperplaneSignature(col("vec"), bits, dim, seed))
    val a = v.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = v.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", VectorOps.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim").distinct()
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the corpus by nearest coarse centroid, then compare vectors
    * ONLY within a cluster and drop every vector that has a
    * same-cluster neighbor with cosine >= `threshold` and a smaller id
    * (min-id representative — the paper keeps the member farthest from
    * the centroid; min-id is the deterministic, engine-portable variant,
    * and [[graft.operators.GraphOps.dupClusters]] over the in-cell pair
    * list gives the transitive-closure grouping when one winner per
    * connected component is wanted instead of per-pair).
    *
    * Returns the survivors as (id, cell).
    *
    * Scale shape — the whole point of SemDeDup vs all-pairs near-dup:
    * centroids are an md5-ordered corpus sample ([[VectorOps.coarseSample]],
    * the IVF init), shipped as ONE flat array literal into the native
    * `graft_nearest_cell` kernel — assignment is a codegen'd loop inside
    * the scan, no join, no corpus shuffle, O(1) planning in `nlist`.
    * Auto `nlist` targets ~256-vector cells, so in-cell pair work is
    * ~n·128 cosines — LINEAR in corpus size at fixed cell size — and the
    * only shuffles are the self-join on `cell` (one exchange, shared by
    * both sides via ReuseExchange) and the final anti-join on id. Random
    * high-dim embeddings spread near-uniformly over cells; a pathological
    * hot cell (mass-duplicated content) is exactly the case where
    * `trainRounds`-style tighter centroids or a per-cell cap bound the
    * quadratic term — the junk-bucket-cap pattern from [[minHashLsh]].
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 0): DataFrame = {
    val c0 = df.select(col(idCol).as("id"), VectorOps.toDoubleVec(col(vecCol)).as("vec"))
    val (effNlist, sample) =
      VectorOps.coarseSample(c0.select(col("id").as("n_id"), col("vec").as("n_vec")), nlist)
    if (sample.isEmpty)
      return c0.select(col("id"), lit(0).as("cell")).limit(0)
    val centroids = sample.take(effNlist)
    val dim = centroids.head.size
    val flat = lit(centroids.flatten.toArray)
    val assigned = c0.withColumn("cell",
      call_function("graft_nearest_cell", col("vec"), flat, lit(dim)))
    val a = assigned.select(col("cell"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = assigned.select(col("cell"), col("id").as("id_b"), col("vec").as("vec_b"))
    val losers = a.join(b, Seq("cell")).filter(col("id_a") < col("id_b"))
      .filter(VectorOps.cosine(col("vec_a"), col("vec_b")) >= threshold)
      .select(col("id_b").as("id")).distinct()
    assigned.join(losers, Seq("id"), "left_anti").select(col("id"), col("cell"))
  }

  /** B-cubed clustering evaluation (Bagga & Baldwin 1998): score a
    * predicted clustering against a gold one, per-ELEMENT averaged —
    * the standard dedup-quality metric (unlike pair-F1 it neither
    * collapses under one giant cluster nor rewards shattering).
    *
    * Input: one row per element with its predicted cluster `c` and gold
    * cluster `g`. Per element, P = |C∩G|/|C| and R = |C∩G|/|G| — both
    * constant within a (c, g) contingency CELL, so the whole metric
    * reduces to the cell frame: avgP = Σ n_cg²/n_c / N, avgR =
    * Σ n_cg²/n_g / N, and the per-element F1 = 2PR/(P+R) simplifies to
    * 2·n_cg/(n_c+n_g), keeping every numerator an exact integer.
    *
    * Scale shape: ONE exchange keyed (c, g) builds the contingency
    * frame; everything after is |cells|-sized (bounded by the number of
    * non-empty cluster intersections, not the corpus). The cell frame is
    * checkpointed because three branches (cells, per-c, per-g) would
    * otherwise re-run the upstream pair machinery.
    */
  def bcubed(assign: DataFrame): DataFrame = {
    val cells = assign.groupBy(col("c"), col("g"))
      .agg(count(lit(1)).as("n_cg")).localCheckpoint()
    val nC = cells.groupBy("c").agg(sum("n_cg").as("n_c"))
    val nG = cells.groupBy("g").agg(sum("n_cg").as("n_g"))
    cells.join(nC, "c").join(nG, "g")
      .agg(
        sum(col("n_cg")).cast(LongType).as("n_docs"),
        countDistinct(col("c")).as("n_pred"),
        countDistinct(col("g")).as("n_gold"),
        round(sum(col("n_cg") * col("n_cg") / col("n_c").cast(DoubleType)) /
          sum(col("n_cg")), 6).as("bcubed_p"),
        round(sum(col("n_cg") * col("n_cg") / col("n_g").cast(DoubleType)) /
          sum(col("n_cg")), 6).as("bcubed_r"),
        round(sum(lit(2.0) * col("n_cg") * col("n_cg") /
            (col("n_c") + col("n_g")).cast(DoubleType)) /
          sum(col("n_cg")), 6).as("bcubed_f1"))
  }
}
