package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharBigrams, DotProduct, SrpProj, TokenCounts, WinnowFps, WordShingles}

/** Engine extensions: registers the native expressions with Catalyst.
  * Production path: `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (or `.withExtensions(new GraftExtensions)`); `GraftExtensions.ensure`
  * is the defensive same-JVM path for sessions built without the config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_char_bigrams"),
      new ExpressionInfo(classOf[CharBigrams].getName, "graft_char_bigrams"),
      (children: Seq[Expression]) => CharBigrams(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_token_counts"),
      new ExpressionInfo(classOf[TokenCounts].getName, "graft_token_counts"),
      (children: Seq[Expression]) => TokenCounts(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => WordShingles(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "graft_winnow_fps"),
      (children: Seq[Expression]) => WinnowFps(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_srp_proj"),
      new ExpressionInfo(classOf[SrpProj].getName, "graft_srp_proj"),
      (children: Seq[Expression]) => SrpProj(children.head)))
    // whole-operator extension tier: the native as-of join, plus the
    // optimizer rule that narrows its children before their exchanges
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PruneAsOfJoinColumns)
  }
}

object GraftExtensions {
  /** Idempotent late registration for an already-built session. */
  def ensure(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      (children: Seq[Expression]) => DotProduct(children.head, children(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_char_bigrams",
      (children: Seq[Expression]) => CharBigrams(children.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_token_counts",
      (children: Seq[Expression]) => TokenCounts(children.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles",
      (children: Seq[Expression]) => WordShingles(children.head, children(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow_fps",
      (children: Seq[Expression]) => WinnowFps(children.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_srp_proj",
      (children: Seq[Expression]) => SrpProj(children.head),
      "built-in")
  }
}
