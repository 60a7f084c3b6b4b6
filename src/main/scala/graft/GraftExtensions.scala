package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.StemTokens

/** Session extensions registering graft's native Catalyst expressions —
  * apply with `.withExtensions(new GraftExtensions)` (as
  * [[Tables.session]] does) or `spark.sql.extensions=graft.GraftExtensions`
  * on spark-submit. Functions registered here are available to SQL text
  * and to `call_function` alike. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("stem_tokens"),
      new ExpressionInfo(classOf[StemTokens].getName, "stem_tokens"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // explicit arity check: children.head would silently drop extra
        // arguments and throw a bare empty-head error on zero
        require(children.length == 1,
          s"stem_tokens expects exactly 1 argument, got ${children.length}")
        StemTokens(children.head)
      }))
  }
}
