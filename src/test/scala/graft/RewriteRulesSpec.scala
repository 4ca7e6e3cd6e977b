package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** The injected optimizer tier (GraftExtensions.injectOptimizerRule):
  * RewriteHofDot turns the portable HOF dot-product spelling into the
  * codegen'd graft_dot kernel — and, just as important, REFUSES to when
  * the rewrite wouldn't be semantics-preserving.
  */
class RewriteRulesSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  // spark.range doubles are non-nullable, so CreateArray infers
  // array<double> with containsNull = false — the rewrite's green path
  private def nonNullArrays = spark.range(50).select(
    array(col("id").cast("double"), (col("id") * 2).cast("double")).as("a"),
    array((col("id") + 1).cast("double"), (col("id") - 3).cast("double")).as("b"))

  test("HOF dot over non-nullable arrays is rewritten to graft_dot") {
    val df = nonNullArrays.select(VectorOps.dotHof(col("a"), col("b")).as("d"))
    assert(planOf(df).contains("graft_dot"), planOf(df))
    assert(!planOf(df).contains("aggregate("), planOf(df))
    // and the values are the kernel's exactly
    val both = nonNullArrays.select(
      VectorOps.dotHof(col("a"), col("b")).as("h"),
      VectorOps.dot(col("a"), col("b")).as("n")).collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("swapped multiply/add operand order still matches (IEEE-commutative)") {
    val swapped = nonNullArrays.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => y * x),
        lit(0.0), (acc, v) => v + acc).as("d"))
    assert(planOf(swapped).contains("graft_dot"), planOf(swapped))
  }

  test("nullable element type is NOT rewritten and null poisoning is preserved") {
    // when() makes the element nullable -> containsNull = true
    val df = spark.range(4).select(
      array(when(col("id") === 2, lit(null)).otherwise(col("id"))
        .cast("double"), lit(1.0)).as("a"),
      array(lit(2.0), lit(3.0)).as("b"))
    val q = df.select(col("a"), VectorOps.dotHof(col("a"), col("b")).as("d"))
    assert(!planOf(q).contains("graft_dot"), planOf(q))
    val rows = q.collect()
    // the row with the null element keeps the HOF's null-poisoned result
    assert(rows.count(_.isNullAt(1)) == 1, rows.mkString(";"))
  }

  test("a non-zero fold seed is NOT rewritten") {
    val df = nonNullArrays.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(1.5), (acc, v) => acc + v).as("d"))
    assert(!planOf(df).contains("graft_dot"), planOf(df))
  }

  test("a non-product lambda is NOT rewritten") {
    val df = nonNullArrays.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x + y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!planOf(df).contains("graft_dot"), planOf(df))
  }

  test("the rewrite also fires through the SQL surface") {
    nonNullArrays.createOrReplaceTempView("graft_rrs_vecs")
    val df = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y),
        |  cast(0.0 as double), (acc, v) -> acc + v) AS d
        |FROM graft_rrs_vecs""".stripMargin)
    assert(planOf(df).contains("graft_dot"), planOf(df))
  }

  test("HOF plain sum is rewritten to graft_asum with bit-identical values") {
    val df = nonNullArrays.select(col("a"),
      aggregate(col("a"), lit(0.0), (acc, v) => acc + v).as("s"))
    assert(planOf(df).contains("graft_asum"), planOf(df))
    assert(!planOf(df).contains("aggregate("), planOf(df))
    df.collect().foreach { r =>
      val expect = r.getSeq[Double](0).foldLeft(0.0)(_ + _)
      assert(r.getDouble(1) == expect, r)
    }
  }

  test("HOF sum over a zip_with input still becomes the fused graft_dot, not graft_asum") {
    val df = nonNullArrays.select(VectorOps.dotHof(col("a"), col("b")).as("d"))
    assert(planOf(df).contains("graft_dot") && !planOf(df).contains("graft_asum"),
      planOf(df))
  }

  test("HOF sum over nullable elements is NOT rewritten; null poisoning preserved") {
    val df = spark.range(4).select(
      when(col("id") === 2, lit(null).cast("double"))
        .otherwise(col("id").cast("double")).as("x"))
      .select(array(col("x"), lit(1.0)).as("a"))
    val q = df.select(aggregate(col("a"), lit(0.0), (acc, v) => acc + v).as("s"))
    assert(!planOf(q).contains("graft_asum"), planOf(q))
    assert(q.collect().count(_.isNullAt(0)) == 1)
  }

  test("a -0.0 fold seed is NOT rewritten (empty array returns -0.0, kernel +0.0)") {
    // Scala/Java numeric == can't tell -0.0 from 0.0; the guard matches
    // raw bits, so the negative-zero seed keeps the interpreted HOF
    val dot = nonNullArrays.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(-0.0), (acc, v) => acc + v).as("d"))
    assert(!planOf(dot).contains("graft_dot"), planOf(dot))
    val sum = nonNullArrays.select(
      aggregate(col("a"), lit(-0.0), (acc, v) => acc + v).as("s"))
    assert(!planOf(sum).contains("graft_asum"), planOf(sum))
    // and the semantic difference the guard protects is real: on an
    // empty array the HOF returns its seed bit-exactly
    val empty = spark.sql(
      "SELECT aggregate(cast(array() as array<double>), -0.0d, (acc, v) -> acc + v) AS s")
    val bits = java.lang.Double.doubleToRawLongBits(empty.collect()(0).getDouble(0))
    assert(bits == java.lang.Double.doubleToRawLongBits(-0.0))
  }

  test("graft_asum called directly null-poisons a null element like the HOF") {
    val df = spark.range(4).select(
      array(when(col("id") === 2, lit(null).cast("double"))
        .otherwise(col("id").cast("double")), lit(1.0)).as("a"))
    df.createOrReplaceTempView("graft_rrs_nulls")
    val direct = spark.sql("SELECT graft_asum(a) AS s FROM graft_rrs_nulls")
    val hof = spark.sql(
      "SELECT aggregate(a, 0.0d, (acc, v) -> acc + v) AS s FROM graft_rrs_nulls")
    val d = direct.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val h = hof.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(d.toSeq == h.toSeq, s"direct=${d.toSeq} hof=${h.toSeq}")
    assert(d.count(_.isEmpty) == 1)
  }

  test("the sum rewrite fires through the SQL surface too") {
    nonNullArrays.createOrReplaceTempView("graft_rrs_vecs2")
    val df = spark.sql(
      """SELECT aggregate(a, cast(0.0 as double), (acc, v) -> acc + v) AS s
        |FROM graft_rrs_vecs2""".stripMargin)
    assert(planOf(df).contains("graft_asum"), planOf(df))
  }
}
