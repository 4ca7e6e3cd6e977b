package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011) — the
  * compressed-domain ANN tier: a d-dim vector becomes M sub-codes (one
  * per d/M-dim subspace, each the L2-nearest of ksub codebook centroids),
  * and query-to-corpus similarity is approximated from a per-query lookup
  * table without ever touching the original vectors. At 100 TB the point
  * is MEMORY: M=8/ksub=256 turns a 64-float embedding (256 B) into 8
  * bytes — a 32x smaller scan that often fits storage tiers the raw
  * vectors never could; the per-pair score cost drops from d multiplies
  * to M table adds.
  *
  * Vectors are L2-NORMALIZED inside the kernels (unconditionally — a
  * zero vector NaN-propagates exactly like the cosine family), so the
  * ADC dot approximates COSINE similarity, keeping this tier
  * rank-compatible with bruteForce/LSH/IVF.
  *
  * Like the centroid kernels, the codebook travels as ONE flat
  * `array<double>` literal (layout `[(m*ksub + j)*dsub + t]`), and every
  * loop folds ascending with the same operation order as the DuckDB
  * oracle — q_embed_pq hash-matches bit-for-bit.
  */
object PqKernel {

  def prepare(fn: String, centsExpr: Expression, dsubExpr: Expression,
      ksubExpr: Expression): (Array[Double], Int, Int) = {
    require(centsExpr.foldable, s"$fn: codebook must be a constant array literal")
    require(dsubExpr.foldable && ksubExpr.foldable, s"$fn: dsub/ksub must be constants")
    val flat = centsExpr.eval().asInstanceOf[ArrayData].toDoubleArray()
    val dsub = dsubExpr.eval().asInstanceOf[Number].intValue()
    val ksub = ksubExpr.eval().asInstanceOf[Number].intValue()
    require(dsub > 0 && ksub > 0, s"$fn: dsub/ksub must be positive")
    require(flat.nonEmpty && flat.length % (dsub * ksub) == 0,
      s"$fn: codebook length ${flat.length} is not a multiple of dsub*ksub=${dsub * ksub}")
    (flat, dsub, ksub)
  }

  /** Unit-normalized copy; ascending fold for the norm (graft_dot order),
    * unconditional division (zero vector → NaN, as in the cosine family).
    */
  private def normalized(vec: ArrayData): Array[Double] = {
    val n = vec.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) { val x = vec.getDouble(i); s += x * x; i += 1 }
    val norm = math.sqrt(s)
    i = 0
    while (i < n) { out(i) = vec.getDouble(i) / norm; i += 1 }
    out
  }

  /** Per-subspace L2-nearest code; equal distances keep the lowest code
    * (strict <). Shared by interpreted eval and codegen.
    */
  def encode(vec: ArrayData, flat: Array[Double], dsub: Int, ksub: Int): ArrayData = {
    val xn = normalized(vec)
    val m = xn.length / dsub
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < ksub) {
        val coff = (mi * ksub + j) * dsub
        var d2 = 0.0
        var t = 0
        while (t < dsub) {
          val d = xn(mi * dsub + t) - flat(coff + t)
          d2 += d * d
          t += 1
        }
        if (d2 < bestD) { bestD = d2; best = j }
        j += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  /** Per-query ADC lookup table: entry [m*ksub + j] = dot(query subvector
    * m, centroid j of subspace m), ascending folds. Shared by interpreted
    * eval and codegen.
    */
  def table(vec: ArrayData, flat: Array[Double], dsub: Int, ksub: Int): ArrayData = {
    val qn = normalized(vec)
    val m = qn.length / dsub
    val out = new Array[Double](m * ksub)
    var mi = 0
    while (mi < m) {
      var j = 0
      while (j < ksub) {
        val coff = (mi * ksub + j) * dsub
        var dot = 0.0
        var t = 0
        while (t < dsub) { dot += qn(mi * dsub + t) * flat(coff + t); t += 1 }
        out(mi * ksub + j) = dot
        j += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score: sum over subspaces (ascending) of the table entry the
    * row's code selects — M adds per pair, vector-free. Shared by
    * interpreted eval and codegen.
    */
  def score(codes: ArrayData, table: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var mi = 0
    while (mi < m) { s += table.getDouble(mi * ksub + codes.getInt(mi)); mi += 1 }
    s
  }
}

/** `graft_pq_encode(vec, codebook_flat, dsub, ksub)` → array<int> codes. */
case class PqEncode(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val (flat, dsub, ksub) =
    PqKernel.prepare(prettyName, second, third, fourth)

  override def nullSafeEval(v: Any, c: Any, d: Any, k: Any): Any =
    PqKernel.encode(v.asInstanceOf[ArrayData], flat, dsub, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = PqKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val flatRef = ctx.addReferenceObj("pqCodebook", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _, d, k) =>
      s"${ev.value} = $kernel.encode($v, $flatRef, $d, $k);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** `graft_pq_table(vec, codebook_flat, dsub, ksub)` → array<double> ADC table. */
case class PqTable(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_table"

  @transient private lazy val (flat, dsub, ksub) =
    PqKernel.prepare(prettyName, second, third, fourth)

  override def nullSafeEval(v: Any, c: Any, d: Any, k: Any): Any =
    PqKernel.table(v.asInstanceOf[ArrayData], flat, dsub, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = PqKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val flatRef = ctx.addReferenceObj("pqCodebook", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _, d, k) =>
      s"${ev.value} = $kernel.table($v, $flatRef, $d, $k);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** `graft_pq_score(codes, table, ksub)` → double ADC similarity. */
case class PqScore(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(DoubleType), IntegerType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_score"

  override def nullSafeEval(c: Any, t: Any, k: Any): Any =
    PqKernel.score(c.asInstanceOf[ArrayData], t.asInstanceOf[ArrayData],
      k.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = PqKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (c, t, k) =>
      s"${ev.value} = $kernel.score($c, $t, $k);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
