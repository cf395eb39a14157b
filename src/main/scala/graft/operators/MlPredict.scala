package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.providers.{ChatProvider, EmbeddingProvider, ModelRegistry}

/** The Spark-side `ML_PREDICT` surface (reference
  * generate_personalized_commands.sh:332-335, 360-361, 417-432: LATERAL
  * TABLE(ML_PREDICT('model', col))). Flink's lateral model call appends the
  * model's output column per input row; here it is a DataFrame transform.
  *
  * Physical strategy (the part that matters at scale): remote inference is
  * RPC-bound, so the batched form uses mapPartitions with one provider call
  * per `batchSize` rows — partition-local, zero shuffle, concurrency =
  * number of partitions. The UDF form exists for composition inside larger
  * expressions; it is marked non-deterministic so Catalyst never
  * re-executes or reorders an expensive model call past filters
  * (SURVEY.md §7.4 #2).
  */
object MlPredict {

  /** Per-row UDF form of embedding ml_predict. Deterministic flag off:
    * prevents duplicate remote calls via CSE/pushdown reordering. */
  def embedUdf(provider: EmbeddingProvider): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => if (s == null) null else provider.embed(s)).asNondeterministic()

  /** Batched embedding: appends `outCol ARRAY<FLOAT>`. One provider RPC per
    * `batchSize` rows per partition. */
  def withEmbedding(df: DataFrame, provider: EmbeddingProvider,
                    inCol: String, outCol: String,
                    batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add(StructField(outCol, ArrayType(FloatType)))
    val inIdx = df.schema.fieldIndex(inCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val texts = rows.map(r => Option(r.getString(inIdx)).getOrElse(""))
        val embs = provider.embedBatch(texts)
        rows.lazyZip(embs).map((r, e) => Row.fromSeq(r.toSeq :+ e.toSeq))
      }
    }(Encoders.row(outSchema))
  }

  /** Batched chat completion: appends `outCol STRING` built from the
    * model's system prompt + the per-row prompt column. */
  def withCompletion(df: DataFrame, provider: ChatProvider, modelName: String,
                     inCol: String, outCol: String,
                     batchSize: Int = 16): DataFrame = {
    val sysPrompt = ModelRegistry.get(modelName).systemPrompt
    val outSchema = df.schema.add(StructField(outCol, StringType))
    val inIdx = df.schema.fieldIndex(inCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val prompts = rows.map(r => Option(r.getString(inIdx)).getOrElse(""))
        val outs = provider.completeBatch(prompts, sysPrompt)
        rows.lazyZip(outs).map((r, o) => Row.fromSeq(r.toSeq :+ o))
      }
    }(Encoders.row(outSchema))
  }
}
