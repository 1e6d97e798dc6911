package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.GraftFunctions

/** Session-construction plug-in registering the graft SQL functions:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions()(_))
  * }}}
  *
  * For an already-running session use
  * `org.apache.spark.sql.graft.GraftFunctions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    GraftFunctions.identifiers.foreach { case (id, info, builder) =>
      extensions.injectFunction((id, info, builder))
    }
    // Portable HOF formulations silently upgrade to native expressions
    extensions.injectOptimizerRule(_ => RewriteHofDot)
  }
}
