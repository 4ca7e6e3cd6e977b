package graft

import graft.functions.BpeOps
import org.apache.spark.sql.functions._

class BpeOpsSpec extends SparkSpec {
  import spark.implicits._

  private def seqsOf(rows: (String, Long)*) =
    rows.toDF("seq", "freq")

  test("pairCounts weights by frequency and drops single-symbol rows") {
    val got = BpeOps.pairCounts(seqsOf("a b c" -> 3L, "b c" -> 2L, "x" -> 9L))
      .as[(String, Long)].collect().toMap
    assert(got == Map("a b" -> 3L, "b c" -> 5L))
  }

  test("applyMerge is greedy left-to-right on overlapping runs") {
    // BPE on "aaaa" with merge (a,a) pairs leftmost-first: aa aa — a
    // single-space replace would share the middle separator between
    // matches and produce aa a a instead.
    val got = BpeOps.applyMerge(seqsOf("a a a a" -> 1L, "a a a" -> 1L), "a a")
      .select("seq").as[String].collect().toSeq
    assert(got == Seq("aa aa", "aa a"))
  }

  test("applyMerge only matches whole symbols, not substrings of merged ones") {
    // after 'x e' merged into xe, a later merge (e, l) must not fire
    // inside "xe l" — 'e' there is the tail of symbol xe.
    val got = BpeOps.applyMerge(seqsOf("xe l o" -> 1L, "e l o" -> 1L), "e l")
      .select("seq").as[String].collect().toSeq
    assert(got == Seq("xe l o", "el o"))
  }

  test("bpeEncode counts subwords with trained merges; no cross-word merges") {
    // (a,a) dominates -> trained merge 1. doc 0: each "aa" word merges
    // to ONE symbol (3 words -> 3 subwords). doc 1 "za az": the a|a
    // adjacency at the word boundary must NOT merge even though (a,a)
    // is the trained pair -> z,a / a,z stay 4 subwords.
    val docs = Seq((0L, "aa aa aa"), (1L, "za az")).toDF("doc_id", "text")
    val rows = BpeOps.bpeEncode(docs, "text", "doc_id", merges = 1)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(rows == Seq((0L, 3L, 3L), (1L, 2L, 4L)))
  }

  test("training stops early when nothing is left to merge (no crash)") {
    // vocabulary {"ab"}: one merge collapses it to a single symbol, so
    // round 2 has no pairs; and a single-char-token corpus has an empty
    // vocabulary from round 1
    val collapsible = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val rows = BpeOps.bpeEncode(collapsible, "text", "doc_id", merges = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows == Seq((0L, 2L, 2L))) // each "ab" one symbol after merge 1
    val degenerate = Seq((0L, "a b c")).toDF("doc_id", "text")
    val deg = BpeOps.bpeEncode(degenerate, "text", "doc_id", merges = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(deg == Seq((0L, 3L, 3L))) // no merges trainable; chars pass through
  }

  test("bpeMerges learns the planted top pair and applies it end-to-end") {
    // "ab" dominates: 6 occurrences of token "abc" vs 2 of "xyz". After
    // merge 1 (a b -> ab) the top remaining pair is (ab, c).
    val docs = Seq("abc abc abc", "abc abc abc", "xyz xyz").toDF("text")
    val top = BpeOps.bpeMerges(docs, "text", merges = 1, topK = 2)
      .as[(String, Long)].collect().toSeq
    assert(top.head == ("ab c", 6L))
  }
}
