package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the md5-derived deterministic "randomness" the
  * query catalog uses wherever a production pipeline would draw from an
  * RNG (sampling keys, bootstrap weights, stand-in model weights): both
  * engines hash the same key and decode the digest's leading 32 bits,
  * so every draw is oracle-checkable bit for bit.
  *
  * The column-expression spelling of that decode —
  * `ascii(substring(md5(k), i, 1))` summed over i = 1..8 — re-extracts
  * from the hex string eight times, and when it sits inside a
  * higher-order-function lambda (q_linear_quality's per-token weight
  * fold) Spark interprets it row-at-a-time with NO subexpression
  * elimination, recomputing the md5 itself up to 8x per token. These
  * expressions compute the identical value in one digest + one shift
  * sequence inside WholeStageCodegen; the MessageDigest instance is
  * thread-local, so the JCE getInstance lookup is amortized across a
  * whole partition rather than paid per value.
  *
  * Value identity with the column form (load-bearing for the oracles):
  * the first 8 hex chars of md5 are exactly the first 4 digest bytes,
  * so the 16-adic integer V = sum(hexval_i * 16^(8-i)) is the unsigned
  * big-endian int32 of digest[0..3]. The uniform u = sum(hexval_i /
  * 16^i) equals V / 2^32 — and both spellings are EXACT in binary
  * floating point (every term is a 4-bit significand at a descending
  * power-of-two scale; partial sums never exceed 32 significant bits),
  * so `cast(V as double) / 4294967296.0` reproduces the summed form
  * bit-identically. HashExpressionsSpec pins both identities.
  */
object HashKernels {
  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def top32(h: Array[Byte]): Long =
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)

  /** Unsigned int32 of the first 4 md5 digest bytes of s's UTF-8 bytes
    * (== the 16-adic value of the first 8 hex chars of `md5(s)`).
    */
  def md5Top32Utf8(s: UTF8String): Long = {
    val d = localMd.get()
    d.reset()
    val b = s.getBytes
    d.update(b, 0, b.length)
    top32(d.digest())
  }

  /** Σ over tokens of (md5Top32(prefix ++ token) mod `mod`) − (mod−1)/2
    * — the hashed-feature linear-model weight sum, one digest per token.
    * Mirrors the `aggregate(toks, 0L, acc + weight(t))` fold exactly,
    * including null poisoning: a null element nulls the whole sum (the
    * fold's `acc + null`), an empty array is 0.
    */
  def weightSum(arr: ArrayData, prefix: Array[Byte], mod: Long): java.lang.Long = {
    val half = (mod - 1) / 2
    val d = localMd.get()
    var sum = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val tb = arr.getUTF8String(i).getBytes
      d.reset()
      d.update(prefix, 0, prefix.length)
      d.update(tb, 0, tb.length)
      sum += top32(d.digest()) % mod - half
      i += 1
    }
    java.lang.Long.valueOf(sum)
  }
}

/** `graft_md5_top32(str)` → long: unsigned int32 of the first four md5
  * digest bytes. Deterministic-uniform primitive: `u = cast(… as
  * double) / 4294967296.0` is an exact [0, 1) uniform, `… % m` a
  * bucket/weight draw — one digest, no hex-string materialization, no
  * 8x substring/ascii decode.
  */
case class Md5Top32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_top32"

  override def nullSafeEval(s: Any): Any =
    HashKernels.md5Top32Utf8(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HashKernels.md5Top32Utf8($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_weight_sum(tokens[, prefix, mod])` → long: the q_linear_quality
  * inference kernel — per token, weight = md5Top32(prefix ++ token) mod
  * `mod` − (mod−1)/2 (zero-centered for odd mod), summed over the array.
  * Replaces an interpreted `aggregate()` HOF fold (CodegenFallback, md5
  * recomputed up to 8x per token) with one codegen'd call per row.
  */
case class HashWeightSum(child: Expression, prefix: String, mod: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(mod > 0 && mod % 2 == 1,
    s"graft_weight_sum: mod must be odd and positive (zero-centered range), got $mod")

  private lazy val prefixBytes: Array[Byte] =
    prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_weight_sum"

  override def nullSafeEval(arr: Any): Any =
    HashKernels.weightSum(arr.asInstanceOf[ArrayData], prefixBytes, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pref = ctx.addReferenceObj("prefix", prefixBytes, "byte[]")
      val r = ctx.freshName("r")
      s"""
         |java.lang.Long $r = graft.functions.HashKernels.weightSum($a, $pref, ${mod}L);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
