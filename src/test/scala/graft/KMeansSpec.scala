package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{KMeans, Similarity}

/** Lloyd k-means trainer for the IVF centroid table. Float means are
  * parallel sums (not bit-pinned across engines), so the contracts here
  * are structural: exact blob recovery on separated data, deterministic
  * assignments, monotone SSE, empty-cell survival.
  */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // two well-separated blobs in 4-d with deterministic jitter
  private def blobs = (0L until 200L).map { i =>
    val center = if (i % 2 == 0) 10f else -10f
    (i, Seq.tabulate(4)(d => center + ((i * 7 + d * 3) % 5).toFloat / 10f))
  }

  test("recovers two separated blobs exactly; assignments deterministic across runs") {
    val df = blobs.toDF("vec_id", "embedding")
    val cents = KMeans.fit(df, "vec_id", "embedding", 2, 3)
    assert(cents.count() == 2)
    val assign = Similarity.ivfAssign(df, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("cell")).as[(Long, Long)].collect().toMap
    // every even id (blob +10) in one cell, every odd id in the other
    val evenCells = assign.filter(_._1 % 2 == 0).values.toSet
    val oddCells = assign.filter(_._1 % 2 == 1).values.toSet
    assert(evenCells.size == 1 && oddCells.size == 1 && evenCells != oddCells)
    // deterministic: a second fit lands every vector in the same cell
    val cents2 = KMeans.fit(df, "vec_id", "embedding", 2, 3)
    val assign2 = Similarity.ivfAssign(df, "vec_id", "embedding", cents2)
      .select(col("vec_id"), col("cell")).as[(Long, Long)].collect().toMap
    assert(assign2 == assign)
    // centroids sit at the blob means (±0.5 jitter window)
    val cs = cents.orderBy("cent_id").select("cvec").as[Seq[Double]].collect()
    assert(cs.forall(c => c.forall(x => math.abs(math.abs(x) - 10.2) < 0.5)))
  }

  test("SSE is non-increasing over Lloyd iterations") {
    val df = blobs.toDF("vec_id", "embedding")
    val sses = (0 to 3).map(it =>
      KMeans.sse(df, "embedding", KMeans.fit(df, "vec_id", "embedding", 4, it)))
    sses.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-9, sses) }
  }

  test("k=1 converges to the global mean (ulp-tolerance)") {
    val df = blobs.toDF("vec_id", "embedding")
    val c = KMeans.fit(df, "vec_id", "embedding", 1, 1)
      .select("cvec").as[Seq[Double]].collect()(0)
    val want = df.select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy("d").agg(avg(col("x"))).orderBy("d")
      .select("avg(x)").as[Double].collect()
    c.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("fitInt: integer Lloyd recovers blobs, floor-division means, bit-stable across runs") {
    // quantize the float blobs like sim_kmeans_cells: half-up floor ×1000
    // + offset so every value is non-negative (floor contract)
    val df = blobs.toDF("vec_id", "embedding").select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 1000d + 0.5d) + 20000L).as("qv"))
    val cents = KMeans.fitInt(df, "vec_id", "qv", 2, 3)
    val assign = Similarity.ivfAssign(
        df, "vec_id", "qv",
        cents.select(col("cent_id"), col("qvec").cast("array<double>").as("cvec")))
      .select(col("vec_id"), col("cell")).as[(Long, Long)].collect().toMap
    val evenCells = assign.filter(_._1 % 2 == 0).values.toSet
    val oddCells = assign.filter(_._1 % 2 == 1).values.toSet
    assert(evenCells.size == 1 && oddCells.size == 1 && evenCells != oddCells)
    // bit-stable: integer sums + floor-division means leave NO float
    // nondeterminism — a second fit yields IDENTICAL centroids
    val c1 = cents.orderBy("cent_id").select("qvec").as[Seq[Long]].collect().toSeq
    val c2 = KMeans.fitInt(df, "vec_id", "qv", 2, 3)
      .orderBy("cent_id").select("qvec").as[Seq[Long]].collect().toSeq
    assert(c1 == c2)
    // centroid components are exact floor-division means: blob +10 →
    // values near 30000+200 window, all within the jitter span
    assert(c1.forall(_.forall(v => v > 9000 && v < 31000)))
  }

  test("duplicate seed vectors: the shadowed cell stays on its seed (no crash, no NaN)") {
    // ids 0 and 1 share a vector → ties go to cent 0, cell 1 gets no members
    val df = (Seq((0L, Seq(5f, 5f)), (1L, Seq(5f, 5f))) ++
      (2L until 50L).map(i => (i, Seq(100f + i % 3, 100f)))).toDF("vec_id", "embedding")
    val cents = KMeans.fit(df, "vec_id", "embedding", 2, 2)
      .orderBy("cent_id").select("cvec").as[Seq[Double]].collect()
    assert(cents.length == 2 && cents.forall(_.forall(x => !x.isNaN)))
  }

  test("fitInt means FLOOR on negative sums (DuckDB // semantics, not Long /)") {
    // one cell, two vectors: sums (-7, 7, -1) over count 2 must floor to
    // (-4, 3, -1), where truncating division would give (-3, 3, 0)
    val df = Seq(
      (0L, Seq(-3L, 4L, 0L)),
      (1L, Seq(-4L, 3L, -1L))
    ).toDF("vec_id", "qvec")
    val cents = KMeans.fitInt(df, "vec_id", "qvec", 1, 1)
      .select("qvec").collect()(0).getSeq[Long](0)
    assert(cents == Seq(-4L, 3L, -1L))
  }
}
