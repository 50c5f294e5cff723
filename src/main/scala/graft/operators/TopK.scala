package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Scale-safe per-group top-k: a bounded O(k) aggregation buffer with
  * map-side combine, instead of the `row_number().over(partitionBy(g))`
  * window that SORTS every group in full — on a hot group at 100 TB the
  * window is one giant sort task, the aggregator never holds more than k
  * entries per group per partition (then merges k-vs-k).
  *
  * Ordering: descending by `ord`, ties broken ascending by `id` — the
  * deterministic contract of the window formulation it replaces
  * (equality asserted in TopKSpec and by sharing q_window_topk's oracle).
  *
  * Buffer layout: two parallel primitive arrays `(ords, ids)` kept sorted —
  * an [[ExpressionEncoder]]-able product, so partial-merge exchanges ship
  * compact unsafe rows (the previous `ArrayBuffer` buffer fell back to Java
  * serialization on every exchange).
  */
object TopK {

  private class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), (Array[Double], Array[Long]), Seq[(Double, Long)]] {

    /** true iff (ao, ai) ranks strictly before (bo, bi) (desc ord, asc id). */
    private def before(ao: Double, ai: Long, bo: Double, bi: Long): Boolean =
      ao > bo || (ao == bo && ai < bi)

    private def insert(b: (Array[Double], Array[Long]), o: Double, id: Long): (Array[Double], Array[Long]) = {
      val (os, is) = b
      val n = os.length
      if (n == k && !before(o, id, os(n - 1), is(n - 1))) return b // cheap reject
      var pos = 0
      while (pos < n && before(os(pos), is(pos), o, id)) pos += 1
      val m = math.min(n + 1, k)
      val no = new Array[Double](m)
      val ni = new Array[Long](m)
      System.arraycopy(os, 0, no, 0, pos)
      System.arraycopy(is, 0, ni, 0, pos)
      no(pos) = o
      ni(pos) = id
      val rest = m - pos - 1
      if (rest > 0) {
        System.arraycopy(os, pos, no, pos + 1, rest)
        System.arraycopy(is, pos, ni, pos + 1, rest)
      }
      (no, ni)
    }

    def zero: (Array[Double], Array[Long]) = (Array.emptyDoubleArray, Array.emptyLongArray)
    def reduce(b: (Array[Double], Array[Long]), in: (Double, Long)): (Array[Double], Array[Long]) =
      insert(b, in._1, in._2)
    def merge(a: (Array[Double], Array[Long]), b: (Array[Double], Array[Long])): (Array[Double], Array[Long]) = {
      var acc = a
      var i = 0
      while (i < b._1.length) { acc = insert(acc, b._1(i), b._2(i)); i += 1 }
      acc
    }
    def finish(b: (Array[Double], Array[Long])): Seq[(Double, Long)] =
      b._1.indices.map(i => (b._1(i), b._2(i)))
    def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
      Encoders.product[(Array[Double], Array[Long])]
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
    * no meaningful slot for "unordered"). The id column must already be
    * an integral type — a string id would cast to null row-by-row and
    * silently drop candidates, so it is rejected here instead.
    */
  def perGroupWithOrd(df: DataFrame, groupCol: String, ordCol: String,
                      idCol: String, k: Int): DataFrame = {
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"TopK id column '$idCol' must be integral (byte/short/int/long), got $idType — " +
        "use the row_number window formulation for non-numeric ids")
    df.filter(col(ordCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(agg(col(ordCol), col(idCol), k).as("_tk"))
      .select(col(groupCol), posexplode(col("_tk")).as(Seq("_pos", "_e")))
      .select(col(groupCol), col("_e._1").as(ordCol), col("_e._2").as(idCol),
        (col("_pos") + 1).cast("int").as("rank"))
  }
}
