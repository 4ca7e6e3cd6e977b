package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator over (score, id) pairs — the scale-friendly
  * reduction for ANN scoring (SURVEY.md §7.3).
  *
  * Why not a window: `row_number().over(partitionBy(q_id))` must shuffle
  * EVERY scored candidate row to the query's reducer before ranking. An
  * Aggregator gets Spark's partial aggregation: each map task reduces its
  * candidates to at most k locally (ObjectHashAggregate), so the shuffle
  * carries ≤ k rows per (query, partition) — at 100 TB corpus scale the
  * difference between shuffling billions of rows and thousands.
  *
  * Buffer: a sorted array capped at k (insertion into a ≤k array beats a
  * heap at the k values used here and serializes cheaply). Determinism:
  * ties broken by smaller id, matching the window form's
  * `orderBy(desc(score), id)`.
  */
case class Scored(score: Double, id: Long)

class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[Scored], Seq[Scored]] {

  override def zero: Seq[Scored] = Seq.empty

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def insert(buf: Seq[Scored], v: Scored): Seq[Scored] = {
    if (buf.length >= k && !better(v, buf.last)) return buf
    val out = (buf :+ v).sortWith(better)
    if (out.length > k) out.take(k) else out
  }

  override def reduce(buf: Seq[Scored], v: (Double, Long)): Seq[Scored] =
    insert(buf, Scored(v._1, v._2))

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

object TopKAggregator {
  /** Column form usable in `df.groupBy("q_id").agg(topK(k, $"cos", $"id"))`:
    * returns array<struct<score,id>> ranked best-first.
    */
  def topK(k: Int, score: Column, id: Column): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(new TopKAggregator(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(score, id)
  }
}
