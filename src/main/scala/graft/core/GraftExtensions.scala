package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.{CharEntropy, CosineSimilarityFloat, DotProductFloat, MlPredictExpression, SplitTextGenerator, VectorSearchGenerator, WinnowGenerator}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions in the SQL function registry, so `spark.sql` users get
  * the same codegen'd operators as the DataFrame API
  * (`SELECT vector_cosine(a.embedding, b.embedding) ...`), plus the
  * splitter GENERATOR — `LATERAL VIEW split_text_gen(text, ...)` is the
  * SQL spelling of the reference's
  * `CROSS JOIN UNNEST(ML_CHARACTER_TEXT_SPLITTER(...))` with no
  * intermediate array materialization (the array-returning `split_text`
  * UDF stays registered for scalar call sites).
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.core.GraftExtensions")`
  * (done by Sessions.local) or on any existing cluster config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("split_text_gen"),
      new ExpressionInfo(classOf[SplitTextGenerator].getName, "split_text_gen"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.nonEmpty && children.length <= 8,
          "split_text_gen(text[, size, overlap, sep, is_regex, " +
            "keep_separator, trim_chunks, sep_position]) takes 1-8 arguments")
        // trailing args configure the splitter and must be literals —
        // they shape the OPERATOR, not per-row data
        def arg[T](i: Int, default: T, f: Any => T): T =
          if (children.length <= i) default
          else {
            require(children(i).foldable,
              s"split_text_gen argument ${i + 1} must be a literal")
            val v = children(i).eval(null)
            require(v != null,
              s"split_text_gen argument ${i + 1} must not be NULL")
            try f(v) catch {
              case e @ (_: NumberFormatException | _: IllegalArgumentException) =>
                throw new IllegalArgumentException(
                  s"split_text_gen argument ${i + 1} has the wrong type " +
                    s"(got '$v'): ${e.getMessage}", e)
            }
          }
        SplitTextGenerator(children(0),
          size = arg(1, 200, _.toString.toInt),
          overlap = arg(2, 20, _.toString.toInt),
          sep = arg(3, "###", _.toString),
          isRegex = arg(4, false, _.toString.toBoolean),
          keepSeparator = arg(5, false, _.toString.toBoolean),
          trimChunks = arg(6, true, _.toString.toBoolean),
          sepPosition = arg(7, "START", _.toString))
      }))
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
    ext.injectFunction((
      new FunctionIdentifier("winnow_gen"),
      new ExpressionInfo(classOf[WinnowGenerator].getName, "winnow_gen"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          "winnow_gen(canonical_text, k, w) takes 3 arguments")
        def intArg(i: Int, name: String): Int = {
          require(children(i).foldable,
            s"winnow_gen argument $name must be a literal")
          val v = children(i).eval(null)
          require(v != null, s"winnow_gen argument $name must not be NULL")
          try v.toString.toInt catch {
            case e: NumberFormatException =>
              throw new IllegalArgumentException(
                s"winnow_gen argument $name has the wrong type (got '$v')", e)
          }
        }
        WinnowGenerator(children(0), intArg(1, "k"), intArg(2, "w"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "char_entropy"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "char_entropy(text) takes 1 argument")
        CharEntropy(children(0))
      }))
    // the reference's LATERAL TABLE(ML_PREDICT('model', col)) — model
    // resolution via ModelRegistry, output type from the model's task
    ext.injectFunction((
      new FunctionIdentifier("ml_predict"),
      new ExpressionInfo(classOf[MlPredictExpression].getName, "ml_predict"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          "ml_predict(model, input) takes 2 arguments")
        require(children(0).foldable,
          "ml_predict argument 1 (model name) must be a literal")
        val m = children(0).eval(null)
        require(m != null, "ml_predict argument 1 (model name) must not be NULL")
        MlPredictExpression(m.toString, children(1))
      }))
    // the reference's LATERAL TABLE(VECTOR_SEARCH(table, k,
    // DESCRIPTOR(embedding), qe.embedding)) — store resolved by name,
    // one (rank, document_id, chunks, score) row per hit
    ext.injectFunction((
      new FunctionIdentifier("vector_search"),
      new ExpressionInfo(classOf[VectorSearchGenerator].getName, "vector_search"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          "vector_search(store, k, query_embedding) takes 3 arguments")
        def lit(i: Int, name: String): Any = {
          require(children(i).foldable,
            s"vector_search argument $name must be a literal")
          val v = children(i).eval(null)
          require(v != null, s"vector_search argument $name must not be NULL")
          v
        }
        val k = try lit(1, "k").toString.toInt catch {
          case e: NumberFormatException => throw new IllegalArgumentException(
            "vector_search argument k has the wrong type", e)
        }
        VectorSearchGenerator(lit(0, "store").toString, k, children(2))
      }))
  }
}
