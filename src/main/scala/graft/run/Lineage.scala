package graft.run

import org.apache.spark.sql.{Column, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One lineage cell: rows + token sum for a (sink, input file, partition)
  * triple — the per-partition lineage the reference's chunk bookkeeping
  * tracks per flush (`src/flb_input_chunk.c` chunk→task accounting).
  *
  * Accumulated DURING the write job via `Dataset.observe` so one job
  * yields both the routed output and the commit metadata — the previous
  * two-pass formulation re-ran the whole parse→route transform just to
  * collect these aggregates, doubling the most expensive scan at 100 TB.
  */
final case class LineageStat(sink: String, file: String, pid: Int,
                             rows: Long, sumNTok: Long)

/** Aggregator keyed by (sink, file, pid): a bounded map — cardinality is
  * `sinks × input files × partitions`, independent of row count.
  */
object Lineage {

  type Buf = java.util.HashMap[String, Array[Long]]

  private val Sep = "\u0000" // cannot appear in sink names or file paths

  private object Agg extends Aggregator[(String, String, Int, Long), Buf, Seq[LineageStat]] {
    def zero: Buf = new java.util.HashMap[String, Array[Long]]()

    def reduce(b: Buf, in: (String, String, Int, Long)): Buf = {
      val key = in._1 + Sep + in._2 + Sep + in._3
      val cell = b.get(key)
      if (cell == null) b.put(key, Array(1L, in._4))
      else { cell(0) += 1L; cell(1) += in._4 }
      b
    }

    def merge(a: Buf, b: Buf): Buf = {
      val it = b.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cell = a.get(e.getKey)
        if (cell == null) a.put(e.getKey, e.getValue)
        else { cell(0) += e.getValue()(0); cell(1) += e.getValue()(1) }
      }
      a
    }

    def finish(b: Buf): Seq[LineageStat] = {
      import scala.jdk.CollectionConverters._
      b.entrySet().asScala.toSeq.map { e =>
        val Array(sink, file, pid) = e.getKey.split(Sep, 3)
        LineageStat(sink, file, pid.toInt, e.getValue()(0), e.getValue()(1))
      }.sortBy(s => (s.sink, s.file, s.pid))
    }

    def bufferEncoder: Encoder[Buf] = Encoders.javaSerialization[Buf]
    def outputEncoder: Encoder[Seq[LineageStat]] = ExpressionEncoder[Seq[LineageStat]]()
  }

  private lazy val fn = udaf(Agg, Encoders.product[(String, String, Int, Long)])

  /** Column aggregate for `Dataset.observe`: rows + sum(nTok) per
    * (sink, file, pid).
    */
  def agg(sink: Column, file: Column, pid: Column, nTok: Column): Column =
    fn(sink, file, pid, nTok)

  /** Decode the observed metric value (a Seq of struct Rows). */
  def fromObservation(value: Any): Seq[LineageStat] = value match {
    case rows: scala.collection.Seq[_] => rows.toSeq.map {
      case s: LineageStat => s
      case r: Row => LineageStat(r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))
    }
    case null => Seq.empty
  }
}
