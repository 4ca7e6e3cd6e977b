package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType, LongType}

/** Centroid-assignment expressions for IVF/k-means at large `nlist`.
  *
  * The literal-folded form ([[VectorOps.kMeansIterationFrom]]) builds one
  * plan subtree per centroid — ideal up to ~10² cells (and required where
  * the SQL oracle must reproduce each arithmetic step), but Catalyst
  * planning cost grows with the expression tree, so thousands of cells
  * need the matrix OUT of the plan. Here the centroids travel as ONE flat
  * `array<double>` literal (a single `Literal` node — planning is O(1) in
  * `nlist`; the task binary carrying it is broadcast once per stage), and
  * the scan loop over all cells is a tight primitive kernel inside
  * WholeStageCodegen.
  *
  * Arithmetic parity: per cell, `sim = dot(vec, c) / (vnorm * cnorm)` with
  * ascending-index folds for the dot and both norms — operation-for-
  * operation the order [[VectorOps.kMeansIterationFrom]] uses (graft_dot
  * folds, sqrt-then-multiply-then-divide), so assignments are
  * bit-identical to the literal form, and ties break toward the LOWEST
  * cell on both paths (`array_min` over (-sim, cell) there, strict `>`
  * here) — a trained centroid set indexes exactly as it trained.
  */
object CentroidKernel {

  /** Validate + extract the (flat centroids, dim) constant pair at first
    * use. The centroid argument must be foldable: it is evaluated once
    * per expression instance, never per row.
    */
  def prepare(fn: String, centsExpr: Expression, dimExpr: Expression): (Array[Double], Array[Double], Int) = {
    require(centsExpr.foldable, s"$fn: centroids must be a constant array literal")
    require(dimExpr.foldable, s"$fn: dim must be a constant")
    val flat = centsExpr.eval().asInstanceOf[ArrayData].toDoubleArray()
    val dim = dimExpr.eval().asInstanceOf[Number].intValue()
    require(dim > 0, s"$fn: dim must be positive, got $dim")
    require(flat.length > 0 && flat.length % dim == 0,
      s"$fn: centroid array length ${flat.length} is not a multiple of dim $dim")
    val nlist = flat.length / dim
    val cnorms = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      // ascending fold of squares, then sqrt — same order as the driver
      // precompute in VectorOps.centroidSims (c.map(x => x*x).sum)
      var s = 0.0
      var j = 0
      while (j < dim) { val x = flat(c * dim + j); s += x * x; j += 1 }
      cnorms(c) = math.sqrt(s)
      c += 1
    }
    (flat, cnorms, nlist)
  }

  /** Self-norm with graft_dot's fold order: sqrt of ascending sum of squares. */
  private def selfNorm(vec: ArrayData): Double = {
    var na = 0.0
    var i = 0
    val n = vec.numElements()
    while (i < n) { val x = vec.getDouble(i); na += x * x; i += 1 }
    math.sqrt(na)
  }

  private def cellSim(vec: ArrayData, flat: Array[Double], cnorm: Double,
      off: Int, dim: Int, vnorm: Double): Double = {
    val m = math.min(vec.numElements(), dim)
    var dot = 0.0
    var j = 0
    while (j < m) { dot += vec.getDouble(j) * flat(off + j); j += 1 }
    dot / (vnorm * cnorm)
  }

  /** Argmax-similarity cell; equal sims keep the lowest cell (strict >).
    * Shared by interpreted eval and codegen (called from generated code).
    */
  def nearest(vec: ArrayData, flat: Array[Double], cnorms: Array[Double], dim: Int): Int = {
    val vnorm = selfNorm(vec)
    val nlist = flat.length / dim
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < nlist) {
      val sim = cellSim(vec, flat, cnorms(c), c * dim, dim, vnorm)
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  /** Top `nprobe` cells by (sim desc, cell asc) — partial selection, no
    * allocation beyond the two result-sized arrays. Shared by interpreted
    * eval and codegen.
    */
  def topCells(vec: ArrayData, flat: Array[Double], cnorms: Array[Double],
      dim: Int, nprobe: Int): ArrayData = {
    val nlist = flat.length / dim
    val vnorm = selfNorm(vec)
    val sims = new Array[Double](nlist)
    var c = 0
    while (c < nlist) { sims(c) = cellSim(vec, flat, cnorms(c), c * dim, dim, vnorm); c += 1 }
    val k = math.min(nprobe, nlist)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](nlist)
    var r = 0
    while (r < k) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      c = 0
      while (c < nlist) {
        if (!taken(c) && (best < 0 || sims(c) > bestSim)) { bestSim = sims(c); best = c }
        c += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `graft_nearest_cell(vec, centroids_flat, dim)` → int cell id of the
  * most-cosine-similar centroid (ties → lowest cell). See [[CentroidKernel]].
  */
case class NearestCentroid(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), IntegerType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_cell"

  @transient private lazy val (flat, cnorms, _) =
    CentroidKernel.prepare(prettyName, second, third)

  override def nullSafeEval(v: Any, c: Any, d: Any): Any =
    CentroidKernel.nearest(v.asInstanceOf[ArrayData], flat, cnorms,
      d.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = CentroidKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val flatRef = ctx.addReferenceObj("centroids", flat, "double[]")
    val normRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _, d) =>
      s"${ev.value} = $kernel.nearest($v, $flatRef, $normRef, $d);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** `graft_top_cells(vec, centroids_flat, dim, nprobe)` → array<int> of the
  * `nprobe` most-similar cells, sim desc with cell-asc tie-break. See
  * [[CentroidKernel]].
  */
case class TopCentroids(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_top_cells"

  @transient private lazy val (flat, cnorms, _) =
    CentroidKernel.prepare(prettyName, second, third)

  override def nullSafeEval(v: Any, c: Any, d: Any, p: Any): Any =
    CentroidKernel.topCells(v.asInstanceOf[ArrayData], flat, cnorms,
      d.asInstanceOf[Number].intValue(), p.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = CentroidKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val flatRef = ctx.addReferenceObj("centroids", flat, "double[]")
    val normRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _, d, p) =>
      s"${ev.value} = $kernel.topCells($v, $flatRef, $normRef, $d, $p);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** `graft_might_contain(key, filter_bytes)` — Bloom-filter membership
  * probe against a serialized `org.apache.spark.util.sketch.BloomFilter`,
  * codegen'd. Replaces the row-at-a-time Scala UDF this repo previously
  * used in [[graft.operators.BloomJoin]]: a UDF probe on the BIG side of
  * a semi join boxes every key and breaks WholeStageCodegen exactly where
  * row throughput matters most; this is one virtual call into the sketch
  * per row, inside codegen, no boxing.
  *
  * The serialized filter must be a foldable binary literal — it is
  * deserialized once per expression instance (per task after plan
  * broadcast), never per row. Null keys yield null (rows dropped by a
  * filter, matching the UDF's `false`).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, BinaryType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_might_contain"

  @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter = {
    require(right.foldable, s"$prettyName: filter bytes must be a constant binary literal")
    val bytes = right.eval().asInstanceOf[Array[Byte]]
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(k: Any, b: Any): Any =
    filter.mightContainLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (k, _) => s"${ev.value} = $ref.mightContainLong($k);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
