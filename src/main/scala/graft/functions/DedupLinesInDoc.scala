package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Keep the FIRST occurrence of each line within one document — the
  * in-document line dedup rule — in a single O(L) native pass (split
  * on the literal separator, a hash-set membership test per line,
  * re-join).
  *
  * Replaces the HOF spelling in [[graft.ops.Dedup.dedupLinesWithinDoc]]
  * (`filter(lines, (x, i) => array_position(slice(lines, 1, i), x) ===
  * 0)`), which is interpreted AND quadratic-with-copies: element i
  * materializes a fresh i-element prefix array and scans it, so a doc
  * of L lines pays O(L²) array copies + O(L²) comparisons — measured
  * as the whole cost of the text_dedup_lines bench row and its
  * superlinear 15.7× sf1→sf10 ratio (line count per doc grows with
  * scale). Matches the HOF spelling exactly, including: empty lines
  * dedup like any value (first "" survives), ALL split fields kept
  * (trailing empties included — split limit -1), separator matched
  * literally, null text → null. Pinned by OpsSpec's cross-form
  * equality property.
  */
case class DedupLinesInDoc(child: Expression, sep: String)
    extends UnaryExpression {
  require(sep.nonEmpty, "dedup_lines_in_doc separator must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dedup_lines_in_doc requires a string argument, got $other")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "dedup_lines_in_doc"

  override protected def nullSafeEval(input: Any): Any =
    DedupLinesInDoc.compute(input.asInstanceOf[UTF8String], sep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("dedupLinesSep", sep, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DedupLinesInDoc.compute($c, $s)")
  }

  override protected def withNewChildInternal(newChild: Expression): DedupLinesInDoc =
    copy(child = newChild)
}

object DedupLinesInDoc {
  /** Literal-separator split (every field, trailing empties included —
    * regex split limit -1 semantics), first-occurrence filter, re-join.
    * Runs on the DECODED string exactly like the regex-split spelling
    * (invalid UTF-8 becomes U+FFFD on both paths, so garbage input
    * dedups identically).
    */
  def compute(text: UTF8String, sep: String): UTF8String = {
    val s = text.toString
    // No separator → single line, nothing to dedup. Still re-encode
    // from the decoded string (not the raw bytes) so invalid UTF-8
    // comes back replacement-substituted exactly like the regex-split
    // spelling.
    var idx = s.indexOf(sep)
    if (idx < 0) return UTF8String.fromString(s)
    val seen = new java.util.HashSet[String]()
    val out = new java.lang.StringBuilder(s.length)
    var start = 0
    var firstOut = true
    def emit(line: String): Unit =
      if (seen.add(line)) {
        if (!firstOut) out.append(sep)
        out.append(line)
        firstOut = false
      }
    while (idx >= 0) {
      emit(s.substring(start, idx))
      start = idx + sep.length
      idx = s.indexOf(sep, start)
    }
    emit(s.substring(start))
    UTF8String.fromString(out.toString)
  }
}
