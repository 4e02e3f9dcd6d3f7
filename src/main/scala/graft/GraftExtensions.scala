package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Public entry point for wiring graft into any SparkSession:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Injects the graft_* native functions (see graft.functions.Native)
  * and the AsOfJoin planner strategy (graft.plans.AsOfJoinStrategy)
  * at session build time. Sessions that are not built with the
  * extension still get both lazily — the functions the first time
  * they touch graft.sources.Tables, the strategy on the first
  * AsOf.join call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.Native.injectInto(ext)
    ext.injectPlannerStrategy(_ => plans.AsOfJoinStrategy)
  }
}
