package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, MinHash16, Shingles, SimHash48}

/** Engine extension point, installed via `spark.sql.extensions`
  * ([[GraftSession.tune]] wires it into every entry point): registers the
  * engine's native expressions so they are usable from both the DataFrame API
  * (`call_function("graft_dot", ...)`) and plain SQL. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def arity(name: String, n: Int)(b: Seq[Expression] => Expression)
      : Seq[Expression] => Expression = { children =>
    // A clean analysis error instead of an IndexOutOfBounds from the builder.
    if (children.length != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${children.length}")
    b(children)
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      arity("graft_dot", 2)(c => DotProduct(c.head, c(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash48].getName, "graft_simhash"),
      arity("graft_simhash", 1)(c => SimHash48(c.head))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHash16].getName, "graft_minhash"),
      arity("graft_minhash", 1)(c => MinHash16(c.head))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      arity("graft_shingles", 2)(c => Shingles(c.head, c(1)))))
  }
}
