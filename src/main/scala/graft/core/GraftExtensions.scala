package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.{CosineSimilarityFloat, DotProductFloat, SplitTextGenerator}

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
            f(children(i).eval(null))
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
  }
}
