// Hosted under org.apache.spark.sql like the other native expressions
// (Expression↔Column bridging pieces are private[sql]).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, Nondeterministic, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.providers.{ChatProvider, EmbeddingProvider, ModelRegistry, Providers}
import graft.store.VectorStoreRegistry

/** SQL spelling of the reference's `ML_PREDICT('model', col)`
  * (generate_personalized_commands.sh:332-335, 417-432): resolves the
  * model by name through [[graft.providers.ModelRegistry]] and appends
  * the model output per row — `ARRAY<FLOAT>` for `task = "embedding"`,
  * `STRING` (the completion, built with the model's registered system
  * prompt) for `task = "text_generation"`. Registered as `ml_predict`
  * by GraftExtensions, so
  * `SELECT ml_predict('openaiembed', chunk) FROM ...` is the lateral
  * chunk→embed chain in pure SQL.
  *
  * Marked [[Nondeterministic]] for the same reason MlPredict.embedUdf
  * is: Catalyst must never re-execute or reorder a remote model call
  * past filters (CSE, pushdown). CodegenFallback — the body is an RPC,
  * not arithmetic.
  *
  * Scale note: this scalar form evaluates ONE provider call per row;
  * the batched `MlPredict.withEmbedding` / `withCompletion`
  * (mapPartitions, one RPC per batch) remains the production shape for
  * remote endpoints — this function completes SQL parity and is the
  * right call for local/mock backends. Providers resolve lazily
  * per-JVM: on a multi-executor cluster the model registry must be
  * populated on executors too — `spark.plugins=graft.core.GraftPlugin`
  * plus `spark.graft.registrars` runs the registrations on every JVM
  * at startup (see GraftPlugin's scaladoc).
  */
case class MlPredictExpression(modelName: String, child: Expression)
    extends UnaryExpression with Nondeterministic with CodegenFallback {

  @transient private lazy val spec = ModelRegistry.get(modelName)
  @transient private lazy val embedder: EmbeddingProvider = Providers.embedderFor(spec)
  @transient private lazy val chat: ChatProvider = Providers.chatFor(spec)

  override def dataType: DataType = spec.task match {
    case "embedding"       => ArrayType(FloatType, containsNull = false)
    case "text_generation" => StringType
    case t => throw new IllegalArgumentException(
      s"ml_predict: model '$modelName' has unsupported task '$t' " +
        "(expected 'embedding' or 'text_generation')")
  }

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ml_predict needs a STRING input, got ${child.dataType.sql}")
  }

  override protected def initializeInternal(partitionIndex: Int): Unit = ()

  override protected def evalInternal(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else spec.task match {
      case "embedding" =>
        UnsafeArrayData.fromPrimitiveArray(embedder.embed(v.toString))
      case _ =>
        UTF8String.fromString(
          chat.completeBatch(Seq(v.toString), spec.systemPrompt).head)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SQL spelling of the reference's lateral `VECTOR_SEARCH(table, k,
  * DESCRIPTOR(embedding), qe.embedding)`
  * (generate_personalized_commands.sh:377-384): a Generator emitting the
  * top-k hits — (rank, document_id, chunks, score) — per query row,
  * against a store resolved by name through
  * [[graft.store.VectorStoreRegistry]] (the registered store plays the
  * reference's `knowledge_mongodb` external table). Registered as
  * `vector_search` by GraftExtensions:
  *
  * {{{
  * SELECT qid, vs.rank, vs.document_id
  * FROM queries
  * LATERAL VIEW vector_search('knowledge', 3, embedding) vs
  *   AS rank, document_id, chunks, score
  * }}}
  *
  * Scale note: the registered store is a broadcast/remote index — query
  * rows never shuffle (the same contract as CoachingPipeline's retrieve
  * stage). Store resolution is lazy per-JVM, like the model registry.
  * The optional 4th argument is the numCandidates recall knob
  * (reference generate_personalized_commands.sh:304); omitted, the
  * STORE's registered default applies (exact stores ignore it either
  * way). When the resolved store is a persisted
  * [[graft.store.IvfFlatIndexStore]], this generator never evaluates
  * per-row: [[IndexedVectorSearchRule]] rewrites the enclosing lateral
  * into a partition-pruned join against the index at analysis time —
  * the per-row form would launch a Spark job from inside a task. */
case class VectorSearchGenerator(storeName: String, k: Int, child: Expression,
                                 numCandidates: Option[Int] = None)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k > 0, s"vector_search k must be positive, got $k")
  numCandidates.foreach(nc => require(nc > 0,
    s"vector_search numCandidates must be positive, got $nc"))

  @transient private lazy val store = VectorStoreRegistry.get(storeName)

  override def elementSchema: StructType = new StructType()
    .add("rank", IntegerType, nullable = false)
    .add("document_id", StringType, nullable = true)
    .add("chunks", StringType, nullable = true)
    .add("score", DoubleType, nullable = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_search needs an ARRAY<FLOAT> query embedding, got ${t.sql}")
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val arr = v.asInstanceOf[ArrayData]
      // embeddings are dense: a NULL element would silently unbox to
      // 0.0f in toFloatArray and search with a corrupted vector — fail
      // loudly instead (same policy as the injected literal checks)
      var i = 0
      while (i < arr.numElements()) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"vector_search: query embedding has a NULL element at index $i")
        i += 1
      }
      store.search(arr.toFloatArray(), k,
          numCandidates.getOrElse(store.defaultNumCandidates))
        .iterator.zipWithIndex.map { case (hit, j) =>
          InternalRow(j + 1,
            UTF8String.fromString(hit.document_id),
            UTF8String.fromString(hit.chunks),
            hit.score)
        }.toSeq
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `LATERAL VIEW vector_search_diverse('store', k, lambda, emb[, nc])` —
  * the MMR-diversified spelling of [[VectorSearchGenerator]]: slot 1 is
  * the best cosine match, later slots trade relevance against
  * similarity to already-picked hits at weight `lambda`
  * (SimilaritySearch.mmrGreedy semantics); `score` stays the original
  * cosine. Stores that cannot expose candidate vectors (remote hit
  * lists) raise rather than silently returning the undiversified
  * order. Over a persisted [[graft.store.IvfFlatIndexStore]],
  * [[IndexedVectorSearchRule]] rewrites the lateral into the
  * pruned-join + bounded re-rank plan instead of per-row evaluation,
  * exactly as it does for the plain spelling. */
case class VectorSearchDiverseGenerator(storeName: String, k: Int,
                                        lambda: Double, child: Expression,
                                        numCandidates: Option[Int] = None)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k > 0, s"vector_search_diverse k must be positive, got $k")
  require(lambda >= 0.0 && lambda <= 1.0,
    s"vector_search_diverse lambda must be in [0, 1], got $lambda")
  numCandidates.foreach(nc => require(nc > 0,
    s"vector_search_diverse numCandidates must be positive, got $nc"))

  @transient private lazy val store = VectorStoreRegistry.get(storeName)

  override def elementSchema: StructType = new StructType()
    .add("rank", IntegerType, nullable = false)
    .add("document_id", StringType, nullable = true)
    .add("chunks", StringType, nullable = true)
    .add("score", DoubleType, nullable = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_search_diverse needs an ARRAY<FLOAT> query embedding, got ${t.sql}")
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val arr = v.asInstanceOf[ArrayData]
      // same loud-corruption contract as vector_search: a NULL element
      // must not silently search as 0.0f
      var i = 0
      while (i < arr.numElements()) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"vector_search_diverse: query embedding has a NULL element at index $i")
        i += 1
      }
      store.searchDiverse(arr.toFloatArray(), k, lambda,
          numCandidates.getOrElse(store.defaultNumCandidates))
        .iterator.zipWithIndex.map { case (hit, j) =>
          InternalRow(j + 1,
            UTF8String.fromString(hit.document_id),
            UTF8String.fromString(hit.chunks),
            hit.score)
        }.toSeq
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
