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
  * into the session's function registry at build time. Sessions that
  * are not built with the extension still get the functions lazily the
  * first time they touch graft.sources.Tables.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.Native.injectInto(ext)
}
