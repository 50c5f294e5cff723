package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused vector math for the similarity/ANN paths. The composable
  * `zip_with`/`aggregate` formulations are higher-order functions —
  * CodegenFallback, interpreted per ELEMENT (measured ~25× slower, see
  * [[TokenHashes]]) — these run one tight JVM loop per row.
  *
  * Floating-point semantics are IDENTICAL to the column formulations (and
  * the DuckDB oracles): each sum is its own accumulator folded
  * left-to-right in element order, so results are bit-exact equal.
  * Length-mismatched or null-element inputs yield null (zip_with padding
  * semantics).
  */
private[graft] object VecMath {
  /** element accessor widening any numeric array element to double (the
    * same widening the `x.cast("double")` column formulations apply)
    */
  def getter(t: DataType): (ArrayData, Int) => Double = t match {
    case ArrayType(FloatType, _)   => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _)  => (a, i) => a.getDouble(i)
    case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toDouble
    case ArrayType(LongType, _)    => (a, i) => a.getLong(i).toDouble
    case ArrayType(ShortType, _)   => (a, i) => a.getShort(i).toDouble
    case ArrayType(ByteType, _)    => (a, i) => a.getByte(i).toDouble
    case other => throw new IllegalArgumentException(s"vector type $other")
  }
}

/** Σ aᵢ·bᵢ — one pass, sequential fold. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val getL = VecMath.getter(left.dataType)
  @transient private lazy val getR = VecMath.getter(right.dataType)

  def compute(ao: Any, bo: Any): Any = {
    val a = ao.asInstanceOf[ArrayData]
    val b = bo.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var d = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      d += getL(a, i) * getR(b, i)
      i += 1
    }
    java.lang.Double.valueOf(d)
  }

  override def nullSafeEval(a: Any, b: Any): Any = compute(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dot", this, classOf[DotProduct].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $r).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity in ONE pass: dot, |a|², |b|² accumulated together
  * (three independent accumulators, element order — bit-equal to three
  * separate folds); null when either norm is 0.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val getL = VecMath.getter(left.dataType)
  @transient private lazy val getR = VecMath.getter(right.dataType)

  def compute(ao: Any, bo: Any): Any = {
    val a = ao.asInstanceOf[ArrayData]
    val b = bo.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = getL(a, i)
      val y = getR(b, i)
      d += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val sna = math.sqrt(na)
    val snb = math.sqrt(nb)
    if (sna > 0 && snb > 0) java.lang.Double.valueOf(d / (sna * snb)) else null
  }

  override def nullSafeEval(a: Any, b: Any): Any = compute(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cos", this, classOf[CosineSim].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $r).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ (aᵢ−bᵢ)² — one pass. */
case class L2Squared(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val getL = VecMath.getter(left.dataType)
  @transient private lazy val getR = VecMath.getter(right.dataType)

  def compute(ao: Any, bo: Any): Any = {
    val a = ao.asInstanceOf[ArrayData]
    val b = bo.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val dl = getL(a, i) - getR(b, i)
      s += dl * dl
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override def nullSafeEval(a: Any, b: Any): Any = compute(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("l2", this, classOf[L2Squared].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Double) $r).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Random-projection dimensionality REDUCTION: the `planes` deterministic
  * SRP hyperplanes (same weight formula as [[SrpBucket]] — weight (p,d) =
  * ((p·8191+d)·2654435761 mod 2001 − 1000) / 1000) but returning the RAW
  * projection vector (array<double>, length `planes`) instead of its sign
  * bits — the d→k reduce step that runs BEFORE ANN at scale (project once,
  * index/search in k dims). One fused pass per row; per-plane sums are
  * sequential folds in element order, bit-reproducible in any engine.
  */
case class RandomProject(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val get = VecMath.getter(child.dataType)

  def compute(ao: Any): Any = {
    val a = ao.asInstanceOf[ArrayData]
    val n = a.numElements()
    val proj = new Array[Double](planes)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = get(a, i)
      var p = 0
      while (p < planes) {
        val w = (((p * 8191L + i) * 2654435761L) % 2001L) - 1000L
        proj(p) += x * (w.toDouble / 1000.0)
        p += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(proj)
  }

  override def nullSafeEval(a: Any): Any = compute(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rp", this, classOf[RandomProject].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.compute($a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sign-random-projection bucket id over `planes` deterministic
  * hyperplanes (weight (p,d) = ((p·8191+d)·2654435761 mod 2001 − 1000)
  * / 1000): ONE pass over the vector accumulates all `planes` projections
  * in element order — per-projection sums are bit-equal to the per-plane
  * sequential folds of the column formulation.
  */
case class SrpBucket(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val get = VecMath.getter(child.dataType)

  def compute(ao: Any): Any = {
    val a = ao.asInstanceOf[ArrayData]
    val n = a.numElements()
    val proj = new Array[Double](planes)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = get(a, i)
      var p = 0
      while (p < planes) {
        val w = (((p * 8191L + i) * 2654435761L) % 2001L) - 1000L
        proj(p) += x * (w.toDouble / 1000.0)
        p += 1
      }
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < planes) {
      if (proj(p) > 0) bucket |= 1L << p
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override def nullSafeEval(a: Any): Any = compute(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srp", this, classOf[SrpBucket].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.compute($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $r).longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nprobe` nearest centroids of a LITERAL centroid set, by squared L2
  * (ties → smallest centroid id) — the IVF cell assignment as ONE narrow
  * per-row expression. The former formulation (`join(broadcast(centroids))`
  * + `row_number` window) expanded every row ×C and SHUFFLED the expansion
  * just to keep the argmin; with 4k centroids at 100 TB that exchange is
  * the scale-killer. Here the centroid set rides into the task as a plan
  * literal (it is small by contract — same size class as a broadcast dim)
  * and the argmin costs zero exchanges.
  *
  * Per-centroid distance is the same sequential left fold as [[L2Squared]]
  * — bit-identical to the old plan and the DuckDB oracle. Ties keep the
  * smallest id: centroids are pre-sorted by id and selection uses strict
  * `<`. Null elements or a length mismatch vs any centroid → null.
  *
  * @return array<long> of the nprobe nearest centroid ids, nearest first
  */
case class NearestCells(child: Expression, centIds: Array[Long],
                        centVecs: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression {
  require(centIds.length == centVecs.length && centIds.nonEmpty, "empty centroid set")
  require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
  require((1 until centIds.length).forall(i => centIds(i - 1) < centIds(i)),
    "centroid ids must be strictly ascending")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val get = VecMath.getter(child.dataType)
  private val np = math.min(nprobe, centIds.length)

  def compute(ao: Any): Any = {
    val a = ao.asInstanceOf[ArrayData]
    val n = a.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      v(i) = get(a, i)
      i += 1
    }
    // top-np by (dist asc, id asc): insertion into a tiny sorted buffer
    val bd = new Array[Double](np)
    val bi = new Array[Long](np)
    var filled = 0
    var c = 0
    while (c < centVecs.length) {
      val cv = centVecs(c)
      if (cv.length != n) return null
      var s = 0.0
      var j = 0
      while (j < n) { val d = v(j) - cv(j); s += d * d; j += 1 }
      if (filled < np || s < bd(filled - 1)) { // strict < keeps smallest id on ties
        var pos = if (filled < np) filled else np - 1
        while (pos > 0 && s < bd(pos - 1)) {
          bd(pos) = bd(pos - 1); bi(pos) = bi(pos - 1); pos -= 1
        }
        bd(pos) = s
        bi(pos) = centIds(c)
        if (filled < np) filled += 1
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(bi, filled))
  }

  override def nullSafeEval(a: Any): Any = compute(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nc", this, classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.compute($a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Symmetric int8 quantization in ONE pass (well, two reads of the input:
  * max-abs scan, then the code loop) — scale = max|vᵢ|/127, code =
  * ⌊vᵢ/scale + 0.5⌋ (explicit half-up). The column formulation embedded
  * `array_max` INSIDE the `transform` lambda; lambda bodies get no common-
  * subexpression elimination, so every element re-scanned the vector —
  * O(d²) per row. Null elements → null (the inputs this quantizes are
  * dense embeddings; a null element means a broken vector, not a value).
  *
  * @return struct(scale: double, q: array<int> in [-127, 127])
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = true),
    StructField("q", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true

  @transient private lazy val get = VecMath.getter(child.dataType)

  def compute(ao: Any): Any = {
    val a = ao.asInstanceOf[ArrayData]
    val n = a.numElements()
    // empty vector: the column form's array_max is null → (null scale, [])
    if (n == 0) return org.apache.spark.sql.catalyst.InternalRow(null,
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyIntArray))
    val v = new Array[Double](n)
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      v(i) = get(a, i)
      val ab = math.abs(v(i))
      // Double.compare ranks NaN greatest — array_max's ordering, so a
      // NaN-poisoned vector yields (NaN scale, zero codes) in BOTH forms
      if (java.lang.Double.compare(ab, mx) > 0) mx = ab
      i += 1
    }
    val scale = mx / 127.0
    val q = new Array[Int](n)
    if (mx > 0) {
      i = 0
      while (i < n) { q(i) = math.floor(v(i) / scale + 0.5).toInt; i += 1 }
    }
    org.apache.spark.sql.catalyst.InternalRow(scale,
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(q))
  }

  override def nullSafeEval(a: Any): Any = compute(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qi", this, classOf[QuantizeInt8].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = $ref.compute($a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VecMathFunctions {
  def dot(a: Column, b: Column): Column =
    GraftShim.column(DotProduct(GraftShim.expression(a), GraftShim.expression(b)))
  def cosine(a: Column, b: Column): Column =
    GraftShim.column(CosineSim(GraftShim.expression(a), GraftShim.expression(b)))
  def l2sq(a: Column, b: Column): Column =
    GraftShim.column(L2Squared(GraftShim.expression(a), GraftShim.expression(b)))
  def randomProject(v: Column, planes: Int): Column =
    GraftShim.column(RandomProject(GraftShim.expression(v), planes))
  def srpBucket(v: Column, planes: Int): Column =
    GraftShim.column(SrpBucket(GraftShim.expression(v), planes))
  def nearestCells(v: Column, centIds: Array[Long], centVecs: Array[Array[Double]],
                   nprobe: Int): Column =
    GraftShim.column(NearestCells(GraftShim.expression(v), centIds, centVecs, nprobe))
  def quantizeInt8(v: Column): Column =
    GraftShim.column(QuantizeInt8(GraftShim.expression(v)))
}
