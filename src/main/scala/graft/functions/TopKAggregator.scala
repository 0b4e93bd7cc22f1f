package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable.ArrayBuffer

/** Bounded top-k (score desc, id asc) as a typed [[Aggregator]].
  *
  * Replaces `row_number() OVER (PARTITION BY q ORDER BY …) <= k` for top-k
  * selection: the window form shuffles and SORTS every candidate row
  * (O(n²) rows for all-pairs similarity), while an aggregate keeps at most
  * k entries per group per partition and combines partially map-side —
  * the shuffle carries `groups × k` rows instead of all candidates. Spark
  * runs it as a TypedImperativeAggregate: the buffer stays a live JVM
  * object within a partition and serializes (kryo) only at the exchange.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), ArrayBuffer[(Double, Long)], Seq[(Double, Long)]] {

  /** true if a ranks strictly better than b: higher score, tie → lower id. */
  @inline private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: ArrayBuffer[(Double, Long)] = ArrayBuffer.empty

  /** buffer is kept sorted best-first, size ≤ k; insertion is O(k).
    * Duplicate (score, id) entries are ignored, so callers feeding
    * multi-probe candidates (e.g. LSH — same pair from several tables)
    * don't need a distinct/shuffle upstream. */
  override def reduce(buf: ArrayBuffer[(Double, Long)], in: (Double, Long))
      : ArrayBuffer[(Double, Long)] = {
    if (buf.size >= k && !better(in, buf.last)) return buf
    var i = buf.size
    while (i > 0 && better(in, buf(i - 1))) i -= 1
    if (i > 0 && buf(i - 1) == in) return buf // duplicate candidate
    buf.insert(i, in)
    if (buf.size > k) buf.remove(k)
    buf
  }

  override def merge(a: ArrayBuffer[(Double, Long)],
      b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    b.foldLeft(a)(reduce)

  override def finish(buf: ArrayBuffer[(Double, Long)]): Seq[(Double, Long)] =
    buf.toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[(Double, Long)]] =
    Encoders.kryo[ArrayBuffer[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAggregator {
  /** `top_k(score, id)` aggregate column → array<struct<_1: score, _2: id>>
    * sorted best-first. */
  def top_k(k: Int)(score: Column, id: Column): Column = {
    val enc: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    udaf(new TopKAggregator(k), enc)(score, id)
  }
}
