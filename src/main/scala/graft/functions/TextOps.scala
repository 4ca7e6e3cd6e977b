package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, n-gram shingling, language-ID heuristic, quality scoring,
  * document fingerprinting.
  *
  * Everything is a pure Catalyst column expression (no UDFs): whole-stage
  * codegen applies, predicates stay pushable, and the per-row cost is
  * independent of cluster size — the shape that survives a 100 TB corpus.
  */
object TextOps {

  /** Whitespace tokenization (documents.text is space-separated). */
  def tokens(c: Column): Column = split(c, " ")

  /** BPE-ish subword-count proxy: word tokens plus punctuation marks
    * counted separately, the standard cheap estimator when no tokenizer
    * model is shipped with the job.
    */
  def tokenCountBpeIsh(c: Column): Column =
    (size(split(c, "[\\s]+")) + size(split(c, "[^\\p{L}\\p{N}\\s]")) - 1).cast(LongType)

  def tokenCount(c: Column): Column = size(tokens(c)).cast(LongType)

  /** Canonical text form hashed by [[fingerprint]] and used for exact
    * dedup: Unicode NFC (composed-vs-decomposed encodings of the same
    * glyphs must hash identically — native [[graft.functions.NfcNormalize]],
    * DuckDB twin `nfc_normalize`), then whitespace run-collapse (native
    * byte-loop [[graft.functions.WsCollapse]], regexp_replace-equivalent,
    * no regex engine), then built-in lower/trim so Unicode case mapping
    * is untouched.
    */
  def normText(c: Column): Column =
    lower(trim(call_function("graft_ws_collapse", call_function("graft_nfc", c))))

  /** 128-bit -> 64-bit hex document fingerprint over normalized text.
    * md5 is chosen over xxhash64 because every SQL engine (and the DuckDB
    * oracle) computes the identical digest.
    */
  def fingerprint(c: Column): Column = substring(md5(normText(c)), 1, 16)

  /** Winnowing fingerprint set (rolling-hash k-grams, min per w-window) —
    * the near-copy-detection fingerprint; native codegen'd
    * [[graft.functions.WinnowFingerprints]]. Any shared substring of
    * >= w+k-1 chars guarantees a shared fingerprint.
    */
  def winnowFingerprints(c: Column, k: Int = 5, w: Int = 8): Column =
    call_function("graft_winnow", normText(c), lit(k), lit(w))

  /** Word n-gram shingles: `["a","b","c","d"]`, n=3 ->
    * `["a b c","b c d"]`; shorter docs (and null text) yield an empty
    * array. One codegen'd pass via the native
    * [[graft.functions.StringShingles]] kernel.
    */
  def shingles(c: Column, n: Int = 3): Column =
    call_function("graft_shingles", tokens(c), lit(n))

  /** The arrays_zip + transform spelling [[shingles]] replaced — kept
    * for parity testing (TextOpsSpec pins the two byte-equal). Zipping
    * n parallel slices makes the `split` evaluate a CONSTANT number of
    * times per row; the even-more-obvious `transform(sequence(...),
    * i => element_at(tokens(c), i + k))` form re-evaluates the
    * un-materialized split once per ELEMENT inside the interpreted
    * lambda — O(doc_len^2) per row; the bigram twin of that shape
    * measured 11x slower over a 100x corpus.
    */
  def shinglesHof(c: Column, n: Int = 3): Column = {
    val t = tokens(c)
    val win = size(t) - n + 1
    val zipped = arrays_zip((0 until n).map(k => slice(t, lit(k + 1), win)): _*)
    when(size(t) >= n,
      transform(zipped, s =>
        concat_ws(" ", (0 until n).map(k => s.getField(k.toString)): _*))
    ).otherwise(array().cast(ArrayType(StringType)))
  }

  /** Fixed-width character chunks of `c` (sequence-packing unit): one
    * array element per `w`-char window, last one possibly shorter; the
    * empty string yields an empty array, null stays null. One codegen'd
    * pass via the native [[graft.functions.StringChunks]] kernel.
    */
  def chunks(c: Column, w: Int): Column =
    call_function("graft_chunks", c, lit(w))

  /** The transform-over-sequence spelling [[chunks]] replaced — kept for
    * parity testing (the empty-string `when` guards against
    * sequence(0, -1) inferring a -1 step and emitting two bogus chunks).
    */
  def chunksHof(c: Column, w: Int): Column =
    when(length(c) > 0,
      transform(
        sequence(lit(0), floor((length(c) - 1) / lit(w)).cast(IntegerType)),
        i => c.substr(i * w + 1, lit(w)))
    ).when(c.isNotNull, array().cast(ArrayType(StringType)))
    // null input matches neither branch -> stays null

  /** Word bigram array: empty for docs with fewer than two tokens, null
    * stays null. The n=2 case of the native [[graft.functions.StringShingles]]
    * kernel (the kernel itself maps null→empty, so the null passthrough
    * is re-imposed here — `when` leaves the unmatched null row null).
    */
  def bigrams(c: Column): Column =
    when(c.isNotNull, call_function("graft_shingles", tokens(c), lit(2)))

  /** Duplicate fraction 1 - distinct/total of an array column; 0.0 for
    * the empty array, null stays null. The argument is referenced three
    * times: in PROJECTIONS, alias the array in a prior select
    * (CollapseProject keeps multi-referenced non-cheap aliases
    * un-inlined, as `q_repetition` relies on); in FILTER predicates the
    * optimizer alias-substitutes regardless, so budget for re-evaluation
    * there (bounded-length inputs only).
    */
  def dupFrac(arr: Column): Column =
    when(size(arr) === 0, lit(0.0))
      .when(arr.isNotNull, lit(1.0) - size(array_distinct(arr)) / size(arr))

  /** Duplicate-bigram fraction (Gopher repetition signal), zero shuffle.
    * Convenience composition — see [[dupFrac]] for the re-evaluation
    * caveat. Null text -> null (so a `<= threshold` admission gate
    * drops it).
    */
  def dupBigramFrac(c: Column): Column = dupFrac(bigrams(c))

  /** The stage-1 admission gates shared by the batch pipeline
    * (`TrainingDataDemo`) and the streaming front door
    * (`StreamingOps.admitDocuments`): language, quality, length,
    * repetition. ONE definition so batch and streaming admission cannot
    * silently diverge when thresholds are tuned. Expects a `text`
    * column; pure per-row predicates, no shuffle.
    */
  def admissionGates(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .filter(langId(col("text")) === "en")
      .filter(qualityScore(col("text")) >= 0.4)
      .filter(tokenCount(col("text")).between(10, 5000))
      .filter(dupBigramFrac(col("text")) <= 0.6)

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Count of tokens in a fixed word set — the native codegen'd
    * [[graft.functions.CountInSet]]; the `size(filter(...isin...))` HOF
    * form is CodegenFallback and interprets a lambda per token.
    * The set rides in a comma-joined literal, so words must be non-empty
    * and comma-free (true of every marker/stopword list here).
    */
  def countInSet(tokensCol: Column, words: Seq[String]): Column = {
    require(words.nonEmpty, "countInSet needs at least one word")
    require(words.forall(w => w.nonEmpty && !w.contains(",")),
      s"countInSet words must be non-empty and comma-free: $words")
    call_function("graft_count_in", tokensCol, lit(words.mkString(",")))
  }

  def stopwordCount(c: Column, stopwords: Seq[String] = defaultStopwords): Column =
    countInSet(tokens(c), stopwords)

  def stopwordRatio(c: Column, stopwords: Seq[String] = defaultStopwords): Column =
    stopwordCount(c, stopwords) / tokenCount(c)

  /** Ratio of non-alphanumeric, non-space characters — native codegen'd
    * [[graft.functions.PunctCount]] (the regexp_replace formulation
    * compiles a regex and builds the stripped string per row).
    */
  def punctRatio(c: Column): Column =
    call_function("graft_punct_count", c).cast(DoubleType) / length(c)

  /** Distinct-token / token ratio — low values flag boilerplate/spam. */
  def tokenDiversity(c: Column): Column =
    size(array_distinct(tokens(c))).cast(DoubleType) / size(tokens(c))

  /** Marker-word language-ID heuristic (disjoint high-frequency function
    * words per language). A real deployment would score character n-gram
    * profiles the same way — the plan shape (one pass, one score column
    * per language, greatest-wins) is identical.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of", "was", "are"),
    "de" -> Seq("der", "und", "das", "ein", "ist", "nicht"),
    "fr" -> Seq("le", "les", "et", "une", "est", "pas"),
    "es" -> Seq("el", "los", "las", "una", "es", "como"))

  def langScores(c: Column): Seq[(String, Column)] = {
    val t = tokens(c)
    langMarkers.map { case (lang, markers) =>
      lang -> countInSet(t, markers)
    }
  }

  /** Predicted language: arg-max of marker scores, first-listed language
    * wins ties, "und" (undetermined) when no marker hits at all.
    */
  def langId(c: Column): Column = {
    val scores = langScores(c)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(None: Option[Column]) { case (acc, (lang, s)) =>
      val cond = (s === best) && (s > 0)
      Some(acc.fold(when(cond, lit(lang)))(_.when(cond, lit(lang))))
    }.get.otherwise(lit("und"))
  }

  /** Character n-grams of `c` (overlapping, step 1); shorter strings
    * yield an empty array.
    */
  def charNgrams(c: Column, n: Int = 3): Column =
    when(length(c) >= n,
      transform(sequence(lit(0), length(c) - n), i => c.substr(i + 1, lit(n))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Per-language character-trigram profiles, derived deterministically
    * from the marker words with space padding (so word boundaries match
    * inside running text).
    */
  def langTrigramProfiles(n: Int = 3): Seq[(String, Seq[String])] =
    langMarkers.map { case (lang, words) =>
      lang -> words.flatMap(w => s" $w ".sliding(n).toSeq).distinct
    }

  /** Character-n-gram language ID: score = number of the text's trigrams
    * found in each language's profile, argmax wins (first listed on
    * ties), "und" when nothing matches — keyed on char n-grams, the
    * classifier family that generalizes past an exact marker-word list.
    * One codegen'd pass via the native [[LangIdNgram]] kernel (the HOF
    * spelling below re-evaluated the interpreted `transform` once per
    * language in both the argmax and the tie-pick — O(langs²) array
    * materializations per row).
    */
  def langIdNgram(c: Column): Column =
    call_function("graft_lang_ngram", lower(c))

  /** The column-tree spelling [[langIdNgram]] replaced — kept for parity
    * testing (TextOpsSpec pins the two bit-equal), same role as
    * VectorOps.dotHof.
    */
  def langIdNgramHof(c: Column): Column = {
    val grams = charNgrams(lower(c))
    val scores = langTrigramProfiles().map { case (lang, profile) =>
      lang -> countInSet(grams, profile)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(None: Option[Column]) { case (acc, (lang, s)) =>
      val cond = (s === best) && (s > 0)
      Some(acc.fold(when(cond, lit(lang)))(_.when(cond, lit(lang))))
    }.get.otherwise(lit("und"))
  }

  /** Composite quality score in [0,1]: length saturation, lexical
    * diversity, stopword presence, low punctuation noise. Deterministic
    * arithmetic over per-row stats — identical in any engine.
    */
  def qualityScore(c: Column): Column =
    least(length(c).cast(DoubleType) / 500.0, lit(1.0)) * 0.3 +
      tokenDiversity(c) * 0.4 +
      least(stopwordRatio(c) * 5.0, lit(1.0)) * 0.2 +
      (lit(1.0) - least(punctRatio(c) * 10.0, lit(1.0))) * 0.1
}
