package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native word-n-gram expression — semantically identical to the
  * `transform(sequence(...), i -> array_join(slice(...), " "))`
  * composition it replaces (see [[GraftHash.wordNgrams]] for the exact
  * contract), but a single static-kernel pass: no interpreted
  * `transform`/`LambdaFunction` island, no intermediate sequence/slice
  * arrays — the gram stages of the decontamination/Jaccard/bigram-LM
  * queries stay inside whole-stage codegen (PLANS.md higher-order-function
  * rule).
  */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_word_ngrams"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_word_ngrams needs array<string>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    GraftHash.wordNgrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.GraftHash.wordNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}

object WordNgramsExpr {
  import org.apache.spark.sql.graftbridge

  def ngrams(tokens: Column, n: Int): Column =
    graftbridge.toColumn(WordNgramsExpr(graftbridge.toExpression(tokens), n))
}
