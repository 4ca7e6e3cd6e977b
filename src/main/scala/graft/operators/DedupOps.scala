package graft.operators

import graft.functions.{TextOps, VectorOps}
import org.apache.spark.sql.{Column, DataFrame}
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

  private val LargePrime = 2147483647L // 2^31 - 1

  /** Seeded universal-hash parameters for the MinHash permutations. */
  private def hashParams(k: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((math.abs(rnd.nextLong()) % LargePrime + 1, math.abs(rnd.nextLong()) % LargePrime))
  }

  /** k-permutation MinHash signature over word-shingles of `textCol`.
    * Each permutation: min over shingles of ((a * h + b) mod p) with
    * h = xxhash64(shingle) mod p. Reducing h below 2^31 first keeps the
    * product under 2^62 — no long overflow under ANSI mode.
    * Empty shingle sets (docs shorter than n words) get null.
    */
  def minHashSignature(textCol: Column, k: Int = 16, n: Int = 3, seed: Long = 42L): Column = {
    val sh = TextOps.shingles(textCol, n)
    val mins = hashParams(k, seed).map { case (a, b) =>
      array_min(transform(sh, s => pmod(pmod(xxhash64(s), lit(LargePrime)) * a + b, lit(LargePrime))))
    }
    when(size(sh) > 0, array(mins: _*)).otherwise(lit(null).cast(ArrayType(LongType)))
  }

  /** Adds `minhash_sig` plus `bands` band-hash columns (`band_0`..).
    * Two docs collide on a band iff that band's signature rows all match —
    * the classic LSH amplification: P(candidate) = 1-(1-j^r)^b.
    */
  def withMinHashBands(
      df: DataFrame, textCol: String,
      k: Int = 16, bands: Int = 4, n: Int = 3, seed: Long = 42L): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val withSig = df.withColumn("minhash_sig", minHashSignature(col(textCol), k, n, seed))
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
      k: Int = 16, bands: Int = 4, n: Int = 3, seed: Long = 42L): DataFrame = {
    val banded = withMinHashBands(df, textCol, k, bands, n, seed)
      .filter(col("minhash_sig").isNotNull)
      .select(col(idCol), posexplode(array((0 until bands).map(i => col(s"band_$i")): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
    val a = banded.select(col("band"), col("band_hash"), col(idCol).as("id_a"))
    val b = banded.select(col("band"), col("band_hash"), col(idCol).as("id_b"))
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

  /** 64-bit SimHash over word tokens, returned as 4 packed 16-bit band
    * values (`Array[Long]`): per bit, sum +/-1 per token (the token's
    * bit comes from an independent seeded hash `xxhash64(token, bit)`),
    * take the sign. Banded representation serves Hamming LSH directly
    * (two docs within Hamming distance 3 of each other on 64 bits must
    * share at least one of 4 bands exactly).
    */
  def simHashBands(textCol: Column, bandsN: Int = 4): Column = {
    val t = TextOps.tokens(textCol)
    val bitsPerBand = 64 / bandsN
    val counters = aggregate(
      t,
      array_repeat(lit(0L), 64),
      (acc, tok) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          i => when(pmod(xxhash64(tok, i), lit(2)) === 1, lit(1L)).otherwise(lit(-1L))),
        (a, b) => a + b))
    transform(sequence(lit(0), lit(bandsN - 1)), b =>
      aggregate(sequence(lit(0), lit(bitsPerBand - 1)), lit(0L),
        (acc, i) => acc * 2 + when(element_at(counters, b * bitsPerBand + i + 1) > 0, 1L).otherwise(0L)))
  }

  /** SimHash near-dup candidate pairs via band collision (Hamming LSH). */
  def simHashCandidatePairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = df.select(col(idCol), posexplode(simHashBands(col(textCol))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_val"))
    val a = sig.select(col("band"), col("band_val"), col(idCol).as("id_a"))
    val b = sig.select(col("band"), col("band_val"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "band_val")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact n-gram Jaccard pairs via an inverted shingle index: explode
    * distinct shingles, self-join on the shingle (the shuffle key),
    * count shared shingles per pair, Jaccard from |A|+|B|-|shared|.
    * Unlike MinHash this is exact, at the cost of candidate fan-out on
    * common shingles — pair it with a stopword-shingle filter at scale.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3): DataFrame = {
    val sh = df
      .select(col(idCol).as("id"), explode(array_distinct(TextOps.shingles(col(textCol), n))).as("sh"))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
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
}
