package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Vocabulary encoding of one document's token array as ONE row-local
  * native expression: per token, its vocab id (or `unkId` when absent),
  * in position order — exactly [[graft.ops.Vocab.encode]]'s
  * explode → broadcast-join → collect_list/array_sort reassembly, but
  * with no doc-keyed exchange and no per-document sort: the vocabulary
  * is a driver artifact (bounded at vocabSize rows BY CONSTRUCTION —
  * the same boundedness the broadcast join relied on; the standard
  * vocab/nlist/boundary driver-artifact contract) baked into the
  * expression as an O(1) hash map.
  *
  * Output struct: (token_ids array<bigint>, n_tokens, n_unk,
  * n_in_vocab). `n_unk` counts tokens whose FINAL id equals `unkId`
  * (a real vocab entry mapped to unkId counts too — the coalesce rule
  * of the join spelling); `n_in_vocab` counts lookup hits (the
  * [[graft.ops.Vocab.oovStats]] numerator, independent of unkId).
  * Null token elements never occur under the ws_tokens tokenizer; a
  * null array → null struct (callers coalesce to the empty-document
  * row exactly as the old left-join-back did).
  */
case class VocabEncode(child: Expression, vocab: Array[(String, Long)], unkId: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vocab_encode requires an array<string> argument, got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("token_ids", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false),
    StructField("n_in_vocab", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "vocab_encode"

  @transient private lazy val map: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](vocab.length * 2)
    vocab.foreach { case (t, id) => m.put(UTF8String.fromString(t), id) }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("vocabEncode", this, "graft.functions.VocabEncode")
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.compute($c);"
    })
  }

  def compute(arr: ArrayData): InternalRow = {
    val t = arr.numElements()
    val ids = new Array[Any](t)
    var nUnk = 0L
    var nIn = 0L
    var i = 0
    while (i < t) {
      val tok = arr.getUTF8String(i)
      val hit = if (tok == null) null else map.get(tok)
      val id = if (hit == null) unkId else { nIn += 1; hit.longValue() }
      if (id == unkId) nUnk += 1
      ids(i) = id
      i += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(ids), t.toLong, nUnk, nIn))
  }

  override protected def withNewChildInternal(newChild: Expression): VocabEncode =
    copy(child = newChild)
}
