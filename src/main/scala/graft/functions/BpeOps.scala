package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE-style subword vocabulary induction (Sennrich et al. 2016) — the
  * tokenizer-training counterpart of the token-COUNTING estimators in
  * [[TextOps]].
  *
  * Scale shape: the corpus is touched exactly ONCE, by the word-frequency
  * aggregate (one shuffle); every merge round then runs on the distinct-
  * word vocabulary — bounded by language, not corpus size — so 100 TB of
  * text costs the same per round as 100 GB. Per round only the single
  * chosen pair (a few bytes) crosses the driver, the same literal-folding
  * discipline as `VectorOps.kMeansIteration`'s k×dim centroids; the
  * vocabulary itself never collects. `localCheckpoint` bounds lineage per
  * round (the `GraphOps.dupClusters` iteration pattern).
  *
  * Merge semantics: symbol sequences are single-space joined. A merge of
  * pair (x, y) rewrites on a DOUBLED-separator copy — ` x  y ` occurrences
  * in ` s1  s2  … ` — so adjacent matches share no characters and plain
  * leftmost non-overlapping replace IS BPE's greedy left-to-right merge
  * ("aaa" + merge(a,a) → ["aa","a"], never ["a","aa"]); a single-space
  * replace would let one space serve two matches and skip every other
  * merge in a run. Every step (replace / regexp collapse / trim) has
  * bit-identical semantics in ANSI SQL, so whole multi-round outputs are
  * oracle-checkable. ASCII-safe; `(.)` char splitting is code-unit-based,
  * so non-BMP corpora would need a codepoint splitter.
  *
  * Merge-count trade-off: each round is one vocab-scale Spark job, so
  * this shape suits moderate round counts (the oracle-checked regime).
  * For production-size merge tables (30k+ rounds) the right split is the
  * same first half — corpus → word-frequency vocab in one shuffle — then
  * collect the bounded vocab and run the merge loop in one process; 30k
  * driver-coordinated jobs would be scheduler-bound, not data-bound.
  */
object BpeOps {

  /** Weighted adjacent-pair counts over space-joined symbol sequences
    * (`seq`, `freq`). One hash-aggregate shuffle; pairs explode in place.
    */
  def pairCounts(seqs: DataFrame): DataFrame = {
    val syms = split(col("seq"), " ")
    seqs
      .filter(size(syms) >= 2)
      .select(col("freq"),
        explode(zip_with(
          slice(syms, lit(1), size(syms) - 1),
          slice(syms, lit(2), size(syms) - 1),
          (x, y) => concat(x, lit(" "), y))).as("pair"))
      .groupBy("pair").agg(sum("freq").as("cnt"))
  }

  /** Apply one merge (the pair's two symbols concatenate into one) to
    * every sequence. Pure string ops — codegen'd, no UDF.
    */
  def applyMerge(seqs: DataFrame, pair: String): DataFrame = {
    val doubledSeq = concat(lit(" "),
      replace(col("seq"), lit(" "), lit("  ")), lit(" "))
    val doubledPair = " " + pair.replace(" ", "  ") + " "
    val merged = " " + pair.replace(" ", "") + " "
    seqs.withColumn("seq",
      trim(regexp_replace(
        replace(doubledSeq, lit(doubledPair), lit(merged)),
        " +", " ")))
  }

  /** The training loop shared by [[bpeMerges]] and [[bpeEncode]]: run
    * up to `merges` rounds on the word-frequency vocabulary, returning
    * the post-merge symbol sequences AND the chosen pairs in merge
    * order. Stops early (fewer pairs than requested) when nothing is
    * left to merge — a degenerate corpus of single-char tokens, or a
    * merge count that collapses every word to one symbol, must not
    * crash the round's argmax.
    */
  private def trainLoop(docs: DataFrame, textCol: String,
      merges: Int): (DataFrame, Seq[String]) = {
    val words = docs
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    var seqs = words
      .select(trim(regexp_replace(col("word"), "(.)", "$1 ")).as("seq"),
        col("freq"))
      .localCheckpoint()
    val chosen = Seq.newBuilder[String]
    var exhausted = false
    for (_ <- 1 to merges if !exhausted) {
      pairCounts(seqs).orderBy(desc("cnt"), asc("pair")).limit(1)
        .collect().headOption match {
        case Some(row) =>
          val best = row.getString(0)
          chosen += best
          seqs = applyMerge(seqs, best).localCheckpoint()
        case None => exhausted = true
      }
    }
    (seqs, chosen.result())
  }

  /** Run `merges` BPE rounds over the corpus and return the `topK`
    * remaining pair counts (count desc, pair asc — the order the NEXT
    * merges would be chosen in). Ties break to the lexicographically
    * smallest pair, so the whole run is deterministic and oracle-exact.
    */
  def bpeMerges(docs: DataFrame, textCol: String,
      merges: Int, topK: Int): DataFrame = {
    val (seqs, _) = trainLoop(docs, textCol, merges)
    pairCounts(seqs).orderBy(desc("cnt"), asc("pair")).limit(topK)
  }

  /** Tokenizer APPLY: train `merges` rounds (vocab-scale jobs), then
    * encode every document with the trained table and return its subword
    * count — the corpus-scale second half of the tokenizer story.
    *
    * Encoding is ONE linear pass: each document becomes a single symbol
    * sequence (chars, with word gaps as a literal `<w>` boundary symbol
    * that no trained merge can contain, so doubled-separator replaces
    * never merge across words — exactly the per-word semantics training
    * used), the merge table is applied in order as codegen'd string ops
    * (merge pairs are driver literals, like k-means centroids), and the
    * subword count is the symbol count minus the word gaps. No shuffle
    * beyond the ordered output; 100 TB of text encodes in scan time.
    * Assumes `<` `>` do not appear as corpus symbols (they cannot arise
    * from the space-tokenized fixtures; a general tokenizer would
    * escape them).
    */
  def bpeEncode(docs: DataFrame, textCol: String, idCol: String,
      merges: Int): DataFrame = {
    val (_, pairs) = trainLoop(docs, textCol, merges)
    val wordsArr = TextOps.tokens(col(textCol))
    val charSeq = transform(wordsArr, w => trim(regexp_replace(w, "(.)", "$1 ")))
    // fanOut (r20): the char-split + per-merge regexp passes are the
    // corpus-scale cost and otherwise run on the scan's single task;
    // identity at scale — CoreOps.fanOut
    var enc = graft.ops.CoreOps
      .fanOut(docs.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol), size(wordsArr).as("n_words"),
        array_join(charSeq, " <w> ").as("seq"))
    for (p <- pairs) enc = applyMerge(enc, p)
    enc.select(col(idCol), col("n_words").cast("long").as("n_words"),
      (size(split(col("seq"), " ")) - (col("n_words") - 1))
        .cast("long").as("n_subwords"))
  }
}
