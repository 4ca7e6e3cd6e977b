package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles builds word n-grams; short docs yield empty array") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(TextOps.shingles(col("t"), 3).as("s"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1) == Seq.empty)
  }

  test("normText collapses whitespace and lowercases") {
    val got = Seq("  Hello   WORLD \t x ").toDF("t")
      .select(TextOps.normText(col("t"))).as[String].head()
    assert(got == "hello world x")
  }

  test("fingerprint equals md5-prefix of normalized text and is stable") {
    val got = Seq("The  Fox", "the fox").toDF("t")
      .select(TextOps.fingerprint(col("t"))).as[String].collect()
    assert(got(0) == got(1))
    assert(got(0).length == 16)
  }

  test("langId picks marker-majority language, 'und' when no markers") {
    val df = Seq(
      "the cat is on the mat and the dog was here",
      "der hund und das kind ist nicht hier",
      "le chat et les chiens est une famille pas",
      "el gato los perros las casas una es como",
      "zzz qqq www").toDF("t")
      .select(TextOps.langId(col("t")).as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "de", "fr", "es", "und"))
  }

  test("quality score stays in [0,1] on real documents") {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val mm = d.select(
      min(TextOps.qualityScore(col("text"))).as("lo"),
      max(TextOps.qualityScore(col("text"))).as("hi")).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("tokenCountBpeIsh >= whitespace tokenCount on punctuated text") {
    val r = Seq("hello, world! it's a test.").toDF("t")
      .select(TextOps.tokenCount(col("t")).as("ws"),
        TextOps.tokenCountBpeIsh(col("t")).as("bpe")).head()
    assert(r.getLong(1) >= r.getLong(0))
  }
}
