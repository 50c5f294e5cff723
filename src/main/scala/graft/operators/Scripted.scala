package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

/** The scripted-filter surface — the Spark-native analog of the lua filter
  * (reference `plugins/filter_lua/lua.c:330-393`): a user function over
  * each record returning drop / keep / replace.
  *
  * The reference protocol is `cb(tag, ts, record) → (code, ts, record)`
  * with code −1 = drop, 0 = keep original, 1 = replace. Here the host
  * scripting language IS Scala, so the protocol is a typed function on a
  * `Dataset[T]` — compile-time checked, serialized once, no VM bridge.
  * Stateless by contract (like the lua callback); stateful logic belongs
  * in `mapGroupsWithState` (see StreamPipeline.throttle).
  */
object Scripted {

  sealed trait Verdict[+T]
  case object Drop extends Verdict[Nothing]
  case object Keep extends Verdict[Nothing]
  final case class Replace[T](value: T) extends Verdict[T]

  /** Apply the drop/keep/replace protocol. */
  def apply[T: Encoder](fn: T => Verdict[T])(ds: Dataset[T]): Dataset[T] =
    ds.flatMap { t =>
      fn(t) match {
        case Drop       => Iterator.empty
        case Keep       => Iterator.single(t)
        case Replace(v) => Iterator.single(v)
      }
    }
}
