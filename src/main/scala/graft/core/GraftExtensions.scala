package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.{CosineSimilarityFloat, DotProductFloat}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions in the SQL function registry, so `spark.sql` users get
  * the same codegen'd operators as the DataFrame API
  * (`SELECT vector_cosine(a.embedding, b.embedding) ...`).
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.core.GraftExtensions")`
  * (done by Sessions.local) or on any existing cluster config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vector_cosine"),
      new ExpressionInfo(classOf[CosineSimilarityFloat].getName, "vector_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "vector_cosine(a, b) takes 2 arguments")
        CosineSimilarityFloat(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "vector_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "vector_dot(a, b) takes 2 arguments")
        DotProductFloat(children(0), children(1))
      }))
  }
}
