package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Scale-safe per-group top-k: a bounded O(k) aggregation buffer with
  * map-side combine, instead of the `row_number().over(partitionBy(g))`
  * window that SORTS every group in full — on a hot group at 100 TB the
  * window is one giant sort task, the aggregator never holds more than k
  * entries per group per partition (then merges k-vs-k).
  *
  * Ordering: descending by `ord`, ties broken ascending by `id` — the
  * deterministic contract of the window formulation it replaces
  * (equality asserted in TopKSpec and by sharing q_window_topk's oracle).
  */
object TopK {

  final case class Entry(ord: Double, id: Long)

  private class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), ArrayBuffer[(Double, Long)], Seq[(Double, Long)]] {

    /** true iff a ranks strictly before b (desc ord, asc id). */
    private def before(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    private def insert(b: ArrayBuffer[(Double, Long)], x: (Double, Long)): ArrayBuffer[(Double, Long)] = {
      if (b.size == k && !before(x, b.last)) return b // cheap reject
      var pos = 0
      while (pos < b.size && before(b(pos), x)) pos += 1
      b.insert(pos, x)
      if (b.size > k) b.remove(k)
      b
    }

    def zero: ArrayBuffer[(Double, Long)] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[(Double, Long)], in: (Double, Long)): ArrayBuffer[(Double, Long)] =
      insert(b, in)
    def merge(a: ArrayBuffer[(Double, Long)], b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
      b.foldLeft(a)(insert)
    def finish(b: ArrayBuffer[(Double, Long)]): Seq[(Double, Long)] = b.toSeq
    def bufferEncoder: Encoder[ArrayBuffer[(Double, Long)]] =
      Encoders.javaSerialization[ArrayBuffer[(Double, Long)]]
    def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Aggregate column: top-k (ord desc, id asc) pairs per group.
    *
    * Contract: `ord` must be numeric (cast to double — exact for decimals
    * below 2⁵²) and `id` must be INTEGRAL (cast to long; output id type is
    * LongType). Non-numeric ids need the window formulation.
    */
  def agg(ord: Column, id: Column, k: Int): Column =
    udaf(new TopKAgg(k), Encoders.product[(Double, Long)])(ord.cast("double"), id.cast("long"))

  /** DataFrame face: per `groupCol`, the top-k `idCol` rows by `ordCol`
    * descending (ties: id ascending), with a 1-based `rank`.
    */
  def perGroup(df: DataFrame, groupCol: String, ordCol: String,
               idCol: String, k: Int): DataFrame =
    perGroupWithOrd(df, groupCol, ordCol, idCol, k).drop(ordCol)

  /** Like [[perGroup]] but keeps the ordering value (e.g. the cosine
    * score) in the output. Rows with a NULL ordering value are excluded
    * (a window formulation would rank them last; a k-bounded buffer has
    * no meaningful slot for "unordered").
    */
  def perGroupWithOrd(df: DataFrame, groupCol: String, ordCol: String,
                      idCol: String, k: Int): DataFrame =
    df.filter(col(ordCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(agg(col(ordCol), col(idCol), k).as("_tk"))
      .select(col(groupCol), posexplode(col("_tk")).as(Seq("_pos", "_e")))
      .select(col(groupCol), col("_e._1").as(ordCol), col("_e._2").as(idCol),
        (col("_pos") + 1).cast("int").as("rank"))
}
