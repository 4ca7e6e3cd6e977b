package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, d: Int) = {
    val a = df.select(col("id").as("id_a"), col("s").as("p_a"))
    val b = df.select(col("id").as("id_b"), col("s").as("p_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("p_a"), col("p_b")))
      .filter(col("dist") <= d)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }

  private def assertEquiv(rows: Seq[(Long, String)], d: Int): Unit = {
    val df = rows.toDF("id", "s")
    val got = FuzzyJoin.editDistancePairs(df, "id", "s", d)
      .as[(Long, Long, Long)].collect().toSet
    val want = naive(df, d).as[(Long, Long, Long)].collect().toSet
    assert(got == want,
      s"d=$d missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("blocked join equals naive all-pairs on randomly edited strings") {
    // seeded random base strings + random edit chains of every depth
    // around the threshold, mixed lengths above/below/at d+1 — the
    // pigeonhole guarantee and the short-string branch both exercised
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefgh"
    def randStr(n: Int) = (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def edit(s: String): String = {
      val sb = new StringBuilder(s)
      rnd.nextInt(3) match {
        case 0 if sb.nonEmpty => sb.deleteCharAt(rnd.nextInt(sb.length)) // delete
        case 1 => sb.insert(rnd.nextInt(sb.length + 1), alpha(rnd.nextInt(alpha.length))) // insert
        case _ if sb.nonEmpty => sb.setCharAt(rnd.nextInt(sb.length), alpha(rnd.nextInt(alpha.length)))
        case _ => sb.append(alpha(rnd.nextInt(alpha.length)))
      }
      sb.toString
    }
    val bases = Seq(randStr(25), randStr(12), randStr(6), randStr(3), randStr(30))
    val rows = bases.flatMap { base =>
      base +: (1 to 7).map { depth => (1 to depth).foldLeft(base)((s, _) => edit(s)) }
    }.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    for (d <- Seq(1, 3, 5, 8)) assertEquiv(rows, d)
  }

  test("edge shapes: empty strings, equal strings, all-short corpus") {
    val rows = Seq((0L, ""), (1L, ""), (2L, "a"), (3L, "ab"), (4L, "ab"),
      (5L, "abc"), (6L, "xyz"), (7L, "abcd"))
    for (d <- Seq(0, 1, 2, 4)) assertEquiv(rows, d)
  }
}
