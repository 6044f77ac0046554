package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point registering the engine's native
  * expressions into the SQL function registry, so both the Column API
  * and `spark.sql("SELECT iso_duration_seconds(...)")` reach them.
  *
  * Use via `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.isoDurationSeconds)
}

object GraftExtensions {

  private[functions] val isoDurationSeconds
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("iso_duration_seconds"),
    new ExpressionInfo(classOf[IsoDurationSeconds].getName, "iso_duration_seconds"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "iso_duration_seconds takes exactly one argument")
      IsoDurationSeconds(children.head)
    })

  /** Imperative registration for an existing session (tests, Verify). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = isoDurationSeconds
    spark.sessionState.functionRegistry
      .registerFunction(id, info, builder)
  }

  /** Column-API access without SQL registration. */
  def iso_duration_seconds(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(IsoDurationSeconds(GraftColumnBridge.expression(c)))
  }
}
