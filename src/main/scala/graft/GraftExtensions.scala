package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr.{CosineSimilarity, DotProduct, Iso8601Seconds}

/** Library-style session wiring: registers the engine's custom
  * expressions as SQL functions via SparkSessionExtensions, so a consumer
  * enables everything with
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * (or `.withExtensions(new GraftExtensions)`), no imperative register()
  * calls — the idiomatic Spark packaging for a pluggable engine
  * (SURVEY.md §7 custom-work inventory).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, className: String,
      build: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(className, name), // (className, name) ctor
      build)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("iso8601_seconds",
      classOf[Iso8601Seconds].getName,
      exprs => Iso8601Seconds(exprs.head)))
    ext.injectFunction(fn("cosine_sim",
      classOf[CosineSimilarity].getName,
      exprs => CosineSimilarity(exprs.head, exprs(1))))
    ext.injectFunction(fn("dot_product",
      classOf[DotProduct].getName,
      exprs => DotProduct(exprs.head, exprs(1))))
  }
}
