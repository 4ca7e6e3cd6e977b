package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector hot path.
  *
  * The higher-order-function forms (`zip_with` + `aggregate`,
  * VectorOps.dotHof) are CodegenFallback: per row they allocate an
  * intermediate array and interpret a lambda per element — fine for one
  * column, hostile when ANN scoring evaluates millions of (query, doc)
  * pairs. These expressions compile to a tight primitive loop inside
  * WholeStageCodegen (doGenCode), no allocation, no virtual calls.
  *
  * Summation is a sequential left fold — the same order as the HOF form
  * and the DuckDB oracle's list_sum, so results are bit-identical.
  *
  * Precondition (as with the HOF form): array elements are non-null;
  * embeddings are dense vectors.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Plain array-of-double sum as one codegen'd loop — the target of the
  * RewriteHofSum optimizer rule: the portable HOF spelling
  * `aggregate(arr, 0.0d, (acc, x) -> acc + x)` is CodegenFallback and
  * interprets a lambda per element; this is the identical sequential
  * left fold (bit-identical doubles) fused into WholeStageCodegen.
  *
  * Null ELEMENTS null-poison the result exactly like the HOF fold
  * (`acc + null` → null) — registered as a public SQL function, it must
  * keep HOF parity on any input, not only the `containsNull = false`
  * arrays the optimizer rule guards. When the element type is non-null
  * by schema the check compiles away and the hot loop is unchanged.
  */
case class ArraySum(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_asum"

  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def nullable: Boolean = child.nullable || elemNullable

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      s += x.getDouble(i); i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // ev.isNull is a compile-time `false` when nullable is false, so
      // the poison branch is only emitted when elements CAN be null
      val nullCheck =
        if (elemNullable) s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += $a.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused cosine similarity: dot, |a| and |b| in ONE pass over the arrays
  * (vs three passes for dot/norm/norm composed), still codegen'd.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i); double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash over an array of string tokens, as one codegen'd pass.
  *
  * Semantics: per token, one xxhash64; per bit b (0..63), a +/-1 vote from
  * that hash bit; output packs vote signs MSB-first (bit index 0 → MSB).
  * Null tokens are skipped; a null array yields null.
  *
  * Why native: the HOF formulation needs 64 interpreted lambda
  * evaluations per token (aggregate × zip_with) — 153 s for 50k docs at
  * sf0.1. This loop is ~2 machine ops per (token, bit).
  */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val counters = new Array[Long](64)
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) {
        val s = a.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
        var b = 0
        while (b < 64) { counters(b) += ((h >>> b) & 1L) * 2 - 1; b += 1 }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) { r = (r << 1) | (if (counters(b) > 0) 1L else 0L); b += 1 }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val c = ctx.freshName("counters")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val r = ctx.freshName("r")
      val xxh = classOf[XXH64].getName
      s"""
         |long[] $c = new long[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    UTF8String $s = $a.getUTF8String($i);
         |    long $h = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${seed}L);
         |    for (int $b = 0; $b < 64; $b++) { $c[$b] += (($h >>> $b) & 1L) * 2 - 1; }
         |  }
         |}
         |long $r = 0L;
         |for (int $b = 0; $b < 64; $b++) { $r = ($r << 1) | ($c[$b] > 0 ? 1L : 0L); }
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** k-permutation MinHash over word n-gram shingles, one codegen'd pass.
  *
  * Input: the token array. Each token is xxhash64'd once; a shingle's
  * hash chains its n token hashes through XXH64.hashLong; permutation p
  * maps h → (a_p·(h mod P) + b_p) mod P with P = 2³¹−1 and seeded
  * (a, b) — the same universal-hash family as the column-expression
  * form, but without materializing n-gram strings (the concat_ws +
  * transform pipeline is interpreted AND allocates every shingle).
  * Fewer than n tokens ⇒ null signature.
  */
case class MinHashSignature(child: Expression, k: Int, n: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  private val P = 2147483647L
  private val (aArr, bArr) = {
    val rnd = new scala.util.Random(seed)
    val ab = Array.fill(k)((math.abs(rnd.nextLong()) % P + 1, math.abs(rnd.nextLong()) % P))
    (ab.map(_._1), ab.map(_._2))
  }

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val len = a.numElements()
    if (len < n) return null
    val toks = new Array[Long](len)
    var i = 0
    while (i < len) {
      val s = a.getUTF8String(i)
      toks(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
      i += 1
    }
    val mins = Array.fill(k)(Long.MaxValue)
    i = 0
    while (i <= len - n) {
      var h = seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(toks(i + j), h); j += 1 }
      val hm = ((h % P) + P) % P
      var p = 0
      while (p < k) {
        val v = (hm * aArr(p) % P + bArr(p)) % P
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    val xxh = classOf[XXH64].getName
    val gad = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val len = ctx.freshName("len")
      val toks = ctx.freshName("toks")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      val s = ctx.freshName("s")
      s"""
         |int $len = $arr.numElements();
         |if ($len < $n) { ${ev.isNull} = true; } else {
         |  long[] $toks = new long[$len];
         |  for (int $i = 0; $i < $len; $i++) {
         |    UTF8String $s = $arr.getUTF8String($i);
         |    $toks[$i] = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${seed}L);
         |  }
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i <= $len - $n; $i++) {
         |    long $h = ${seed}L;
         |    for (int $j = 0; $j < $n; $j++) { $h = $xxh.hashLong($toks[$i + $j], $h); }
         |    long $hm = (($h % ${P}L) + ${P}L) % ${P}L;
         |    for (int $p = 0; $p < $k; $p++) {
         |      long $v = ($hm * $aRef[$p] % ${P}L + $bRef[$p]) % ${P}L;
         |      if ($v < $mins[$p]) $mins[$p] = $v;
         |    }
         |  }
         |  ${ev.value} = new $gad($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of array elements contained in a fixed word set, codegen'd.
  *
  * Replaces `size(filter(tokens, t => t.isin(words)))` in the language-ID
  * and stopword scorers: the HOF form is CodegenFallback and interprets a
  * lambda per token per call — five such passes per row in the quality
  * pipeline. Here the set membership is one HashSet probe per token
  * inside WholeStageCodegen. Null elements don't match; a null array
  * yields null.
  */
case class CountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.unsafe.types.UTF8String

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_count_in"

  override def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    var n = 0L
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("countInSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |long $n = 0L;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whitespace-run collapse: every run of Java-regex `\s` characters
  * ([ \t\n\x0B\f\r] — ASCII only) becomes a single space, i.e.
  * `regexp_replace(c, "\\s+", " ")` without the regex engine. Because the
  * class is pure ASCII and UTF-8 continuation/lead bytes are >= 0x80, the
  * scan works on raw UTF-8 bytes — no decoding, one output buffer.
  */
case class WsCollapse(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.unsafe.types.UTF8String

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_ws_collapse"

  override def nullSafeEval(input: Any): Any =
    WsCollapse.collapse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = WsCollapse.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $helper.collapse($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WsCollapse {
  import org.apache.spark.unsafe.types.UTF8String

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Shared by interpreted eval and codegen (called from generated code). */
  def collapse(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val out = new Array[Byte](in.length)
    var w = 0
    var i = 0
    var inRun = false
    var changed = false
    while (i < in.length) {
      val b = in(i)
      if (isWs(b)) {
        if (!inRun) { out(w) = ' '; w += 1; inRun = true }
        else changed = true // run collapsed
        if (b != ' ') changed = true // non-space ws normalized
      } else {
        out(w) = b; w += 1; inRun = false
      }
      i += 1
    }
    if (!changed) s // byte-identical; keep the original buffer
    else UTF8String.fromBytes(java.util.Arrays.copyOf(out, w))
  }
}

/** Unicode NFC normalization (java.text.Normalizer), codegen'd. Makes
  * the canonical text form — and so exact dedup, fingerprints, and
  * shingle keys — insensitive to composed-vs-decomposed encodings of
  * the same glyphs ("café" arrives both as U+00E9 and as e+U+0301 in
  * real web corpora; they must hash identically). The DuckDB oracle
  * twin is `nfc_normalize` — both implement Unicode canonical
  * composition, so digests agree. Fast path: `Normalizer.isNormalized`
  * is a cheap scan (quick-check property) and web text is overwhelmingly
  * already NFC — the common row costs one scan, no allocation.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.unsafe.types.UTF8String

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $helper.nfc($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer
  import org.apache.spark.unsafe.types.UTF8String

  /** Shared by interpreted eval and codegen (called from generated code). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Count of codepoints NOT matched by the Java-regex class
  * `[\p{L}\p{N}\s]` — i.e. `length(regexp_replace(c, "[\\p{L}\\p{N}\\s]", ""))`
  * without compiling a regex or materializing the stripped string per
  * row. Class semantics replicate java.util.regex exactly (what Spark's
  * regexp_replace uses): \p{L} = Character.isLetter categories, \p{N} =
  * Nd/Nl/No, \s = ASCII [ \t\n\x0B\f\r].
  */
/** Longest run of equal adjacent elements in a string array. Over a
  * SORTED array this equals the maximum element frequency — the
  * top-unigram count of a token list with zero shuffles: pair with the
  * codegen'd `sort_array` instead of explode + groupBy(doc, token) +
  * groupBy(doc), whose two shuffles over exploded tokens made
  * q_repetition the worst scaler of the 100x smoke (9.2x wall) before
  * this expression. Empty array -> 0, null -> null.
  */
case class MaxRunLength(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_max_run"

  override def nullSafeEval(input: Any): Any =
    MaxRunLength.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = MaxRunLength.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $helper.compute($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaxRunLength {
  /** Shared by interpreted eval and codegen (called from generated code).
    * Null elements count as a run of their own (they sort together).
    */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    var best = 1L
    var run = 1L
    var prev = if (arr.isNullAt(0)) null else arr.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      val same =
        if (prev == null || cur == null) prev == null && cur == null
        else cur.equals(prev)
      run = if (same) run + 1 else 1L
      if (run > best) best = run
      prev = cur
      i += 1
    }
    best
  }
}

case class PunctCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_punct_count"

  override def nullSafeEval(input: Any): Any =
    PunctCount.count(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = PunctCount.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $helper.count($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PunctCount {
  /** Shared by interpreted eval and codegen (called from generated code). */
  def count(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val str = s.toString
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val t = Character.getType(cp)
      val isLetter = Character.isLetter(cp)
      val isNumber = t == Character.DECIMAL_DIGIT_NUMBER ||
        t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
      val isJavaRegexSpace = cp == ' ' || cp == '\t' || cp == '\n' ||
        cp == 0x0B || cp == '\f' || cp == '\r'
      if (!isLetter && !isNumber && !isJavaRegexSpace) n += 1
      i += Character.charCount(cp)
    }
    n
  }
}

/** Distinct word n-gram shingle hashes, one codegen'd pass.
  *
  * Input: the token array. Each token is xxhash64'd once; a shingle's
  * 64-bit hash chains its n token hashes through XXH64.hashLong (same
  * chaining as [[MinHashSignature]]); the result is sorted + deduplicated.
  * This replaces `array_distinct(shingles(text)) → xxhash64(str)` in the
  * n-gram Jaccard inverted index: equality classes are identical (modulo
  * ~2^-64 collisions) but no n-gram string is ever materialized — the
  * concat_ws/transform HOF pipeline was ~6 s of the sf0.1 bench, this is
  * one tight loop. Fewer than n tokens ⇒ empty array.
  */
case class ShingleHashes(child: Expression, n: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(arr: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ShingleHashes.compute(arr.asInstanceOf[ArrayData], n, seed))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ShingleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val gad = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = new $gad($helper.compute($arr, $n, ${seed}L));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word n-gram STRING shingles (`graft_shingles`): `["a","b","c","d"]`,
  * n=3 → `["a b c","b c d"]` in one codegen'd pass. Value-identical to
  * the arrays_zip + `transform(concat_ws)` spelling
  * (TextOps.shinglesHof — interpreted lambda, one struct row + one
  * lambda eval per shingle), including concat_ws's null-skipping join
  * and the wrapper's null/short-doc coercion to the EMPTY array (null
  * in ⇒ empty out, so the output is never null). TextOpsSpec pins
  * parity; the emitted strings feed oracle-matched queries, so they
  * must stay byte-equal to what DuckDB string-builds.
  */
case class StringShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"graft_shingles: n must be >= 1, got $n")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_shingles"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    StringShingles.compute(child.eval(input).asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val helper = StringShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val gad = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        $gad ${ev.value} = $helper.compute(${c.isNull} ? null : ${c.value}, $n);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringShingles {
  private val SEP = UTF8String.fromString(" ")
  private val EMPTY = new org.apache.spark.sql.catalyst.util.GenericArrayData(
    Array.empty[Any])

  /** Shared by interpreted eval and codegen; null/short arrays → empty. */
  def compute(arr: ArrayData, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    if (arr == null) return EMPTY
    val len = arr.numElements()
    if (len < n) return EMPTY
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](len - n + 1)
    i = 0
    while (i <= len - n) {
      // UTF8String.concatWs skips nulls — exactly concat_ws's join
      out(i) = UTF8String.concatWs(SEP,
        java.util.Arrays.copyOfRange(toks, i, i + n): _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Fixed-width character chunks (`graft_chunks`): one array element per
  * `w`-char window, last one possibly shorter — the sequence-packing
  * unit, in one codegen'd pass. Byte-equal to the
  * `transform(sequence(...), i -> substr(i*w+1, w))` spelling
  * (TextOps.chunksHof — one interpreted lambda + one substr walk per
  * chunk): windows are CHARACTER-indexed (UTF8String.substring walks
  * code points, like substr), the empty string yields an empty array,
  * null stays null (plain null propagation — nullSafeEval).
  */
case class StringChunks(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 1, s"graft_chunks: width must be >= 1, got $w")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_chunks"

  override def nullSafeEval(s: Any): Any =
    StringChunks.compute(s.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = StringChunks.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $helper.compute($s, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringChunks {
  /** Shared by interpreted eval and codegen. One byte walk: substring's
    * char indexing re-scans from byte 0 per chunk (O(len²/w) per doc);
    * instead step w char boundaries at a time and copy each byte range
    * directly (chunks must COPY — they outlive the input row buffer).
    */
  def compute(s: UTF8String, w: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val nc = s.numChars()
    if (nc == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val nb = s.numBytes()
    val n = (nc + w - 1) / w
    val out = new Array[Any](n)
    var i = 0     // chunk index
    var b = 0     // current byte offset (start of chunk i)
    while (i < n) {
      var c = 0   // chars consumed within this chunk
      val st = b
      while (c < w && b < nb) {
        b = math.min(b + UTF8String.numBytesForFirstByte(s.getByte(b)), nb)
        c += 1
      }
      // zero-copy view of the byte range, then clone() to own the bytes
      out(i) = UTF8String.fromAddress(s.getBaseObject, s.getBaseOffset + st,
        b - st).clone()
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** One-pass character-n-gram language ID (`graft_lang_ngram`): per
  * text, slide an n-char window, look each gram up in a prebuilt
  * gram → language-bitmask map, accumulate per-language counts, and
  * return the argmax label (first-listed wins ties, "und" when nothing
  * scores). Bit-equal to the column-tree spelling in
  * TextOps.langIdNgramHof — `charNgrams` (an interpreted `transform`
  * HOF) counted per language via CountInSet, where the HOF re-evaluates
  * once per language in BOTH the `greatest` and the `when` chain, i.e.
  * O(langs²) interpreted array materializations per row; this kernel is
  * one codegen'd pass with zero array materialization. Tie-break and
  * the count-every-occurrence semantics match exactly (TextOpsSpec pins
  * parity). Null input yields "und", not null — the HOF form's
  * `when(length >= n, …).otherwise(empty)` coerced null texts to the
  * no-score path, and the DuckDB oracle reproduces that.
  */
case class LangIdNgram(child: Expression,
    profiles: Seq[(String, Seq[String])], n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(profiles.nonEmpty && profiles.size <= 64,
    s"graft_lang_ngram supports 1..64 languages, got ${profiles.size}")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_lang_ngram"

  @transient private lazy val langStrs: Array[UTF8String] =
    profiles.map(p => UTF8String.fromString(p._1)).toArray
  private val und = UTF8String.fromString("und")
  @transient private lazy val gramMask: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long]()
    profiles.zipWithIndex.foreach { case ((_, grams), i) =>
      grams.foreach { g =>
        require(g.length == n, s"profile gram '$g' is not $n chars")
        m.merge(UTF8String.fromString(g), java.lang.Long.valueOf(1L << i),
          (a, b) => java.lang.Long.valueOf(a.longValue() | b.longValue()))
      }
    }
    m
  }

  /** Called from both interpreted eval and generated code.
    *
    * One BYTE walk, not a char-indexed substring loop:
    * `UTF8String.substring(i, i + n)` re-scans from byte 0 to locate
    * the i-th char on every call, making the pass O(len²) per document
    * (measured 3.0s at sf0.1 — the kernel was the bench's one
    * quadratic-in-doc-length hot spot). Instead walk the char
    * boundaries once, keep the last n+1 byte offsets in a ring, and
    * look each window up as a ZERO-COPY `fromAddress` view over the
    * input's own bytes — hash/equals on UTF8String are
    * content-defined, so the view probes the same map entries the
    * copying substring did.
    */
  def compute(s: UTF8String): UTF8String = {
    if (s == null) return und
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    val counts = new Array[Long](langStrs.length)
    val ring = new Array[Int](n + 1)
    var bi = 0 // char-boundary index being recorded (0-based)
    var b = 0  // its byte offset; the final boundary is b == nb
    var done = false
    while (!done) {
      ring(bi % (n + 1)) = b
      if (bi >= n) {
        val st = ring((bi - n) % (n + 1))
        val mask = gramMask.get(UTF8String.fromAddress(base, off + st, b - st))
        if (mask != null) {
          var m = mask.longValue()
          while (m != 0) {
            counts(java.lang.Long.numberOfTrailingZeros(m)) += 1
            m &= m - 1
          }
        }
      }
      if (b >= nb) done = true
      else {
        // clamp malformed trailing multi-byte chars to the buffer end —
        // the same truncation substring() applied
        b = math.min(b + UTF8String.numBytesForFirstByte(s.getByte(b)), nb)
        bi += 1
      }
    }
    var best = -1
    var bestScore = 0L
    var j = 0
    while (j < counts.length) {
      // strictly greater: the FIRST language at the max keeps the win
      if (counts(j) > bestScore) { bestScore = counts(j); best = j }
      j += 1
    }
    if (best < 0) und else langStrs(best)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("langIdNgram", this, classOf[LangIdNgram].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        UTF8String ${ev.value} = $ref.compute(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  /** Shared by interpreted eval and codegen (called from generated code). */
  def compute(arr: ArrayData, n: Int, seed: Long): Array[Long] = {
    val len = arr.numElements()
    if (len < n) return Array.emptyLongArray
    val toks = new Array[Long](len)
    var i = 0
    while (i < len) {
      // null tokens hash like empty strings — no NPE from SQL callers
      val s = if (arr.isNullAt(i)) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
              else arr.getUTF8String(i)
      toks(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
      i += 1
    }
    val m = len - n + 1
    val hs = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(toks(i + j), h); j += 1 }
      hs(i) = h
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted hashes
    var w = 0
    i = 1
    while (i < m) {
      if (hs(i) != hs(w)) { w += 1; hs(w) = hs(i) }
      i += 1
    }
    if (w + 1 == m) hs else java.util.Arrays.copyOf(hs, w + 1)
  }
}

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003):
  * Rabin-Karp rolling hash over character k-grams, then the minimum hash
  * of every w-gram window, deduplicated in document order — the standard
  * rolling-hash fingerprint set for near-copy detection, guaranteed to
  * share fingerprints with any copy of >= w+k-1 contiguous characters.
  *
  * One codegen'd pass: O(len) rolling updates (multiply/add/subtract per
  * character) + an O(len·w) window min (w is small, 4-16). Returns
  * array<long>; shorter-than-k docs yield an empty array.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      WinnowFingerprints.winnow(bytes, k, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = WinnowFingerprints.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val gad = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = new $gad($helper.winnow($s.getBytes(), $k, $w));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  private final val B = 257L // rolling base

  /** Shared by interpreted eval and codegen (called from generated code). */
  def winnow(bytes: Array[Byte], k: Int, w: Int): Array[Long] = {
    val n = bytes.length - k + 1 // number of k-grams
    if (n <= 0) return Array.emptyLongArray
    // rolling k-gram hashes
    val hs = new Array[Long](n)
    var pow = 1L
    var i = 1
    while (i < k) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
    hs(0) = h
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xff) * pow) * B + (bytes(i + k - 1) & 0xff)
      hs(i) = h
      i += 1
    }
    // winnow: min of each w-window of k-gram hashes, rightmost-min rule,
    // record each selected position once
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var lastPos = -1
    var start = 0
    val windows = math.max(1, n - w + 1)
    while (start < windows) {
      val end = math.min(start + w, n)
      var minPos = start
      var j = start + 1
      while (j < end) { if (hs(j) <= hs(minPos)) minPos = j; j += 1 }
      if (minPos != lastPos) { out += hs(minPos); lastPos = minPos }
      start += 1
    }
    out.toArray
  }
}

/** Registration: either `GraftFunctions.register(spark)` imperatively, or
  * `spark.sql.extensions=graft.functions.GraftExtensions` at session
  * build (the standard extension-jar deployment path).
  */
object GraftFunctions {
  /** Evaluate a builder argument that must be a non-null foldable literal
    * (SQL path: `graft_minhash(toks, 16, 3, 42)`). Non-foldable or NULL
    * arguments would otherwise surface as an opaque
    * UnsupportedOperationException / NPE from `eval()`.
    */
  private def constArg(fn: String, pos: String, e: Expression): Any = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: $pos must be a constant literal, got: ${e.sql}")
    val v = e.eval()
    if (v == null) throw new IllegalArgumentException(
      s"$fn: $pos must not be NULL")
    v
  }
  private def constInt(fn: String, pos: String, e: Expression): Int =
    constArg(fn, pos, e).asInstanceOf[Number].intValue()
  private def constLong(fn: String, pos: String, e: Expression): Long =
    constArg(fn, pos, e).asInstanceOf[Number].longValue()

  private[functions] val fns: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("graft_cosine",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    ("graft_asum",
      new ExpressionInfo(classOf[ArraySum].getName, "graft_asum"),
      (es: Seq[Expression]) => ArraySum(es(0))),
    ("graft_simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (es: Seq[Expression]) => SimHash64(es(0), 42L)),
    ("graft_minhash",
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (es: Seq[Expression]) => es match {
        case Seq(arr) => MinHashSignature(arr, 16, 3, 42L)
        case Seq(arr, k, n, s) => MinHashSignature(arr,
          constInt("graft_minhash", "k", k),
          constInt("graft_minhash", "n", n),
          constLong("graft_minhash", "seed", s))
        case _ => throw new IllegalArgumentException(
          "graft_minhash(tokens[, k, n, seed])")
      }),
    ("graft_ws_collapse",
      new ExpressionInfo(classOf[WsCollapse].getName, "graft_ws_collapse"),
      (es: Seq[Expression]) => WsCollapse(es(0))),
    ("graft_nfc",
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (es: Seq[Expression]) => NfcNormalize(es(0))),
    ("graft_punct_count",
      new ExpressionInfo(classOf[PunctCount].getName, "graft_punct_count"),
      (es: Seq[Expression]) => PunctCount(es(0))),
    ("graft_max_run",
      new ExpressionInfo(classOf[MaxRunLength].getName, "graft_max_run"),
      (es: Seq[Expression]) => MaxRunLength(es(0))),
    ("graft_count_in",
      new ExpressionInfo(classOf[CountInSet].getName, "graft_count_in"),
      (es: Seq[Expression]) => es match {
        case Seq(arr, words) =>
          val ws = constArg("graft_count_in", "word list", words)
            .toString.split(',').toSeq
          if (ws.isEmpty || ws.exists(_.isEmpty))
            throw new IllegalArgumentException(
              "graft_count_in: words must be non-empty and comma-free " +
                s"(got '${ws.mkString(",")}'); commas are the separator — " +
                "a word containing a comma cannot be expressed via SQL")
          CountInSet(arr, ws)
        case _ => throw new IllegalArgumentException(
          "graft_count_in(tokens, 'w1,w2,...')")
      }),
    ("graft_shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (es: Seq[Expression]) => es match {
        case Seq(arr) => ShingleHashes(arr, 3, 42L)
        case Seq(arr, n, s) => ShingleHashes(arr,
          constInt("graft_shingle_hashes", "n", n),
          constLong("graft_shingle_hashes", "seed", s))
        case _ => throw new IllegalArgumentException(
          "graft_shingle_hashes(tokens[, n, seed])")
      }),
    ("graft_winnow",
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      (es: Seq[Expression]) => es match {
        case Seq(str) => WinnowFingerprints(str, 5, 8)
        case Seq(str, k, w) => WinnowFingerprints(str,
          constInt("graft_winnow", "k", k),
          constInt("graft_winnow", "w", w))
        case _ => throw new IllegalArgumentException("graft_winnow(text[, k, w])")
      }),
    ("graft_nearest_cell",
      new ExpressionInfo(classOf[NearestCentroid].getName, "graft_nearest_cell"),
      (es: Seq[Expression]) => NearestCentroid(es(0), es(1), es(2))),
    ("graft_top_cells",
      new ExpressionInfo(classOf[TopCentroids].getName, "graft_top_cells"),
      (es: Seq[Expression]) => TopCentroids(es(0), es(1), es(2), es(3))),
    ("graft_might_contain",
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_might_contain"),
      (es: Seq[Expression]) => BloomMightContain(es(0), es(1))),
    ("graft_pq_encode",
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      (es: Seq[Expression]) => PqEncode(es(0), es(1), es(2), es(3))),
    ("graft_pq_table",
      new ExpressionInfo(classOf[PqTable].getName, "graft_pq_table"),
      (es: Seq[Expression]) => PqTable(es(0), es(1), es(2), es(3))),
    ("graft_pq_score",
      new ExpressionInfo(classOf[PqScore].getName, "graft_pq_score"),
      (es: Seq[Expression]) => PqScore(es(0), es(1), es(2))),
    ("graft_md5_top32",
      new ExpressionInfo(classOf[Md5Top32].getName, "graft_md5_top32"),
      (es: Seq[Expression]) => Md5Top32(es(0))),
    ("graft_lang_ngram",
      new ExpressionInfo(classOf[LangIdNgram].getName, "graft_lang_ngram"),
      (es: Seq[Expression]) =>
        LangIdNgram(es(0), TextOps.langTrigramProfiles(), 3)),
    ("graft_shingles",
      new ExpressionInfo(classOf[StringShingles].getName, "graft_shingles"),
      (es: Seq[Expression]) => es match {
        case Seq(arr) => StringShingles(arr, 3)
        case Seq(arr, n) =>
          StringShingles(arr, constInt("graft_shingles", "n", n))
        case _ => throw new IllegalArgumentException("graft_shingles(tokens[, n])")
      }),
    ("graft_chunks",
      new ExpressionInfo(classOf[StringChunks].getName, "graft_chunks"),
      (es: Seq[Expression]) => es match {
        case Seq(str, w) => StringChunks(str, constInt("graft_chunks", "w", w))
        case _ => throw new IllegalArgumentException("graft_chunks(str, w)")
      }),
    ("graft_multi_count",
      new ExpressionInfo(classOf[MultiPhraseCount].getName, "graft_multi_count"),
      (es: Seq[Expression]) => es match {
        case Seq(str, ps) =>
          val phrases = constArg("graft_multi_count", "phrase list", ps)
            .toString.split(',').toSeq
          if (phrases.isEmpty || phrases.exists(_.isEmpty))
            throw new IllegalArgumentException(
              "graft_multi_count: phrases must be non-empty and comma-free " +
                "(commas are the separator)")
          MultiPhraseCount(str, phrases)
        case _ => throw new IllegalArgumentException(
          "graft_multi_count(text, 'p1,p2,...')")
      }),
    ("graft_weight_sum",
      new ExpressionInfo(classOf[HashWeightSum].getName, "graft_weight_sum"),
      (es: Seq[Expression]) => es match {
        case Seq(arr) => HashWeightSum(arr, "w:", 2001L)
        case Seq(arr, p, m) => HashWeightSum(arr,
          constArg("graft_weight_sum", "prefix", p).toString,
          constLong("graft_weight_sum", "mod", m))
        case _ => throw new IllegalArgumentException(
          "graft_weight_sum(tokens[, prefix, mod])")
      }))

  /** Table-valued functions: SQL entry points that resolve to whole
    * custom operators (a `LogicalPlan`, not an `Expression`) — one per
    * bespoke operator family, so spark.sql users reach each without the
    * DataFrame API: the as-of tier, exact dedup, ANN, the PassJoin
    * edit-distance join, the banded range join, and the quarantine
    * ingest read.
    */
  val tableFns: Seq[(String, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    ("graft_asof",
      new ExpressionInfo("graft.plans.NativeAsOfJoin", "graft_asof"),
      (es: Seq[Expression]) => graft.plans.NativeAsOfJoin.sqlBuilder(es)),
    ("graft_dedup",
      new ExpressionInfo("graft.operators.DedupOps", "graft_dedup"),
      (es: Seq[Expression]) => graft.operators.DedupOps.sqlBuilder(es)),
    ("graft_dup_clusters",
      new ExpressionInfo("graft.operators.DedupOps", "graft_dup_clusters"),
      (es: Seq[Expression]) => graft.operators.DedupOps.clustersSqlBuilder(es)),
    ("graft_semdedup",
      new ExpressionInfo("graft.operators.DedupOps", "graft_semdedup"),
      (es: Seq[Expression]) => graft.operators.DedupOps.semDedupSqlBuilder(es)),
    ("graft_dup_clusters_store",
      new ExpressionInfo("graft.operators.DupClusterStore",
        "graft_dup_clusters_store"),
      (es: Seq[Expression]) =>
        graft.operators.DupClusterStore.storeSqlBuilder(es)),
    ("graft_ann",
      new ExpressionInfo("graft.functions.VectorOps", "graft_ann"),
      (es: Seq[Expression]) => graft.functions.VectorOps.sqlBuilder(es)),
    ("graft_fuzzy",
      new ExpressionInfo("graft.operators.FuzzyJoin", "graft_fuzzy"),
      (es: Seq[Expression]) => graft.operators.FuzzyJoin.sqlBuilder(es)),
    ("graft_range",
      new ExpressionInfo("graft.operators.RangeJoin", "graft_range"),
      (es: Seq[Expression]) => graft.operators.RangeJoin.sqlBuilder(es)),
    ("graft_ingest",
      new ExpressionInfo("graft.ops.IngestOps", "graft_ingest"),
      (es: Seq[Expression]) => graft.ops.IngestOps.sqlBuilder(es)),
    ("graft_cdc",
      new ExpressionInfo("graft.ops.ChangeFeed", "graft_cdc"),
      (es: Seq[Expression]) => graft.ops.ChangeFeed.sqlBuilder(es)),
    ("graft_cdc_apply",
      new ExpressionInfo("graft.ops.ChangeFeed", "graft_cdc_apply"),
      (es: Seq[Expression]) => graft.ops.ChangeFeed.applySqlBuilder(es)),
    ("graft_hh",
      new ExpressionInfo("graft.operators.HeavyHitters", "graft_hh"),
      (es: Seq[Expression]) => graft.operators.HeavyHitters.sqlBuilder(es)),
    ("graft_bloom",
      new ExpressionInfo("graft.operators.BloomJoin", "graft_bloom"),
      (es: Seq[Expression]) => graft.operators.BloomJoin.sqlBuilder(es)))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    fns.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
    tableFns.foreach { case (name, info, builder) =>
      spark.sessionState.tableFunctionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
    // planner tier for sessions built WITHOUT spark.sql.extensions (the
    // imperative registration path): extraStrategies is the
    // runtime-injectable twin of injectPlannerStrategy. Skipped when the
    // extensions path already injected the strategy (conf check — the
    // injected planner list is not inspectable), and synchronized so
    // concurrent DataFrame construction cannot double-append.
    val viaExtensions = spark.conf.getOption("spark.sql.extensions")
      .exists(_.contains("GraftExtensions"))
    if (!viaExtensions) synchronized {
      if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.fns.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    GraftFunctions.tableFns.foreach { case (name, info, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name), info, builder))
    }
    // optimizer tier: HOF-spelling -> native-kernel rewrites, plus the
    // materialized-view aggregate rewrite (no-op until a summary is
    // registered via SummaryRewrite.register)
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDot)
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofSum)
    ext.injectOptimizerRule(_ => graft.plans.SummaryRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
