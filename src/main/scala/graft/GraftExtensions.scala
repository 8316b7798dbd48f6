package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, SimHash48}

/** Engine extension point, installed via `spark.sql.extensions`
  * ([[GraftSession.tune]] wires it into every entry point): registers the
  * engine's native expressions so they are usable from both the DataFrame API
  * (`call_function("graft_dot", ...)`) and plain SQL. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash48].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHash48(children.head)))
  }
}
