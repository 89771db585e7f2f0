package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.Det
import org.apache.spark.sql.graftbridge

/** SQL surface for graft operators: register once, then
  * `spark.sql("SELECT graft_minhash_sig(text, 5) ...")` works.
  *
  * Two entry points:
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.expressions.GraftExtensions`
  *    (build-time injection, survives every new session);
  *  - [[GraftFunctions.register]] for an already-running session.
  */
object GraftFunctions {

  private def litLong(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal")
    e.eval().asInstanceOf[Number].longValue
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash_sig" -> { exprs =>
      MinHashSigExpr(exprs(0), litLong(exprs(1), "shingle size k").toInt)
    },
    "graft_duration_seconds" -> { exprs => DurationSecondsExpr(exprs(0)) },
    "graft_simhash64" -> { exprs => Simhash64Expr(exprs(0)) },
    // text-analysis surface: Column compositions re-rooted on the caller's
    // child expressions (tokens: array<string> where noted)
    "graft_tokens" -> { exprs =>
      graftbridge.toExpressionTree(graft.text.TextOps.tokens(
        graftbridge.toColumn(exprs(0)))) },
    "graft_langid" -> { exprs =>
      graftbridge.toExpressionTree(graft.text.TextOps.langId(
        graftbridge.toColumn(exprs(0)))) },
    "graft_fingerprint" -> { exprs =>
      graftbridge.toExpressionTree(graft.text.TextOps.fingerprint(
        graftbridge.toColumn(exprs(0)))) },
    "graft_quality" -> { exprs =>
      graftbridge.toExpressionTree(graft.text.TextOps.qualityScore(
        graftbridge.toColumn(exprs(0)), graftbridge.toColumn(exprs(1)))) },
    // curation-funnel surface (t29's cascade, for SQL-only users): the
    // index of the first rejecting Gopher rule, 0 = pass
    "graft_funnel_stage" -> { exprs =>
      graftbridge.toExpressionTree(graft.text.TextOps.funnelStage(
        graftbridge.toColumn(exprs(0)))) },
    // URL curation surface (t22's canonicalization, for SQL-only users)
    "graft_url_canon" -> { exprs =>
      graftbridge.toExpressionTree(graft.text.UrlOps.canonicalize(
        graftbridge.toColumn(exprs(0)))) },
    "graft_url_host" -> { exprs =>
      graftbridge.toExpressionTree(graft.text.UrlOps.canonicalHost(
        graftbridge.toColumn(exprs(0)))) },
    // deterministic uniform [0,1): the exact keyed-LCG the engine uses
    // internally, built from catalyst arithmetic nodes (a Column-API
    // composition doesn't resolve inside a registry builder)
    "graft_frac" -> { exprs => fracExpression(exprs(0), litLong(exprs(1), "seed")) },
    // native codegen'd dot product over array<float>/array<double>
    "graft_dot" -> { exprs => DotExpr(exprs(0), exprs(1)) },
    // native codegen'd word n-grams over array<string> tokens
    "graft_word_ngrams" -> { exprs =>
      WordNgramsExpr(exprs(0), litLong(exprs(1), "ngram n").toInt) },
    // Morton interleave: graft_zorder(bits, rank0, rank1, ...) — ranks must
    // already be 0-based bucket ranks < 2^bits (see graft.ops.ZOrder)
    "graft_zorder" -> { exprs =>
      val bits = litLong(exprs(0), "bits").toInt
      graftbridge.toExpressionTree(graft.ops.ZOrder.interleave(
        exprs.drop(1).map(graftbridge.toColumn), bits)) })

  /** Catalyst-node twin of [[Det.frac]]. */
  def fracExpression(id: Expression, seed: Long): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{DoubleType, LongType}
    def l(v: Long) = Literal(v)
    val sm = (seed * Det.K + Det.C) % Det.M
    val h0 = BitwiseXor(Remainder(Cast(id, LongType), l(Det.M)), l(sm))
    val r1 = Remainder(Add(Multiply(h0, l(Det.A)), l(Det.C)), l(Det.M))
    val h1 = BitwiseXor(r1, l(sm))
    val r2 = Remainder(Add(Multiply(h1, l(Det.A)), l(Det.C)), l(Det.M))
    Divide(Cast(r2, DoubleType), Literal(Det.M.toDouble))
  }

  /** Register into a live session (temp functions). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      graftbridge.registerFunction(spark, name, builder)
    }
}

/** `--conf spark.sql.extensions=graft.expressions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, null, "", "", "", "", "", "", "scala_udf"), builder))
    }
}
