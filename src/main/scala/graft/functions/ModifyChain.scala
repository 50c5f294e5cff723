package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Modify
import graft.operators.Modify._

/** The whole `filter_modify` rule chain (`plugins/filter_modify/modify.c:
  * 915-1040`) as ONE expression: conditions checked on the original record
  * (ALL must hold — a null-valued KeyValueEquals is three-valued null and
  * NOTOUCHes, exactly like the column formulation's `when(guard, …)`),
  * then the rules run sequentially over one in-memory pair buffer.
  *
  * The column formulation ([[Modify.applyColumns]]) folds one
  * `map_filter`/`map_concat` layer per rule — n intermediate map
  * materializations per row; this interprets the precompiled rule list in
  * a single pass (row-identical by spec and by sharing fb_modify's oracle).
  * Key-position semantics match `map_concat`: every insert lands at the
  * END of the record, removals keep the remaining order.
  */
case class ModifyChain(child: Expression, conditions: Seq[Condition], rules: Seq[Rule])
    extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  def compute(mo: Any): Any = {
    val m = mo.asInstanceOf[MapData]
    val n = m.numElements()
    val ks = new ArrayBuffer[String](n + rules.size)
    val vs = new ArrayBuffer[String](n + rules.size)
    val ka = m.keyArray()
    val va = m.valueArray()
    var i = 0
    while (i < n) {
      ks += ka.getUTF8String(i).toString
      vs += (if (va.isNullAt(i)) null else va.getUTF8String(i).toString)
      i += 1
    }

    def idx(k: String): Int = ks.indexOf(k)

    // three-valued condition logic on the ORIGINAL record; any false OR
    // null conjunct → NOTOUCH (when(guard) only fires on TRUE)
    def cond3(c: Condition): java.lang.Boolean = c match {
      case KeyExists(k)       => java.lang.Boolean.valueOf(idx(k) >= 0)
      case KeyDoesNotExist(k) => java.lang.Boolean.valueOf(idx(k) < 0)
      case KeyValueEquals(k, v) =>
        val j = idx(k)
        if (j < 0) java.lang.Boolean.FALSE
        else if (vs(j) == null) null
        else java.lang.Boolean.valueOf(vs(j) == v)
      case KeyValueDoesNotEqual(k, v) =>
        val e = cond3(KeyValueEquals(k, v))
        if (e == null) null else java.lang.Boolean.valueOf(!e.booleanValue)
    }
    val pass = conditions.forall { c =>
      val r = cond3(c)
      r != null && r.booleanValue
    }

    if (pass) {
      def remove(k: String): Unit = {
        val j = idx(k)
        if (j >= 0) { ks.remove(j); vs.remove(j); () }
      }
      def append(k: String, v: String): Unit = { ks += k; vs += v }
      rules.foreach {
        case Rename(from, to) =>
          val j = idx(from)
          if (j >= 0 && idx(to) < 0) { val v = vs(j); remove(from); append(to, v) }
        case HardRename(from, to) =>
          val j = idx(from)
          if (j >= 0) { val v = vs(j); remove(from); remove(to); append(to, v) }
        case Copy(from, to) =>
          val j = idx(from)
          if (j >= 0 && idx(to) < 0) append(to, vs(j))
        case HardCopy(from, to) =>
          val j = idx(from)
          if (j >= 0) { val v = vs(j); remove(to); append(to, v) }
        case Add(k, v) => if (idx(k) < 0) append(k, v)
        case Set(k, v) => remove(k); append(k, v)
        case Remove(k) => remove(k)
        case RemoveWildcard(p) =>
          var j = 0
          while (j < ks.size) {
            if (ks(j).startsWith(p)) { ks.remove(j); vs.remove(j) } else j += 1
          }
      }
    }

    new ArrayBasedMapData(
      new GenericArrayData(ks.map(UTF8String.fromString(_): Any).toArray),
      new GenericArrayData(vs.map(v =>
        (if (v == null) null else UTF8String.fromString(v)): Any).toArray))
  }

  override def nullSafeEval(m: Any): Any = compute(m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mc", this, classOf[ModifyChain].getName)
    nullSafeCodeGen(ctx, ev, m =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.MapData) $ref.compute($m);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
