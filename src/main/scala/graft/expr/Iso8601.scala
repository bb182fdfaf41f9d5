package graft.expr

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ISO-8601 *duration* → seconds.
  *
  * The reference parses video durations like "PT1H2M10S" to float seconds
  * with `isodate.parse_duration(x).total_seconds()`
  * (/root/reference/fetch_youtube_data.py:184-186). Spark has no builtin for
  * ISO-8601 duration strings (only SQL interval literals), so this is the one
  * custom scalar expression in the parity surface (SURVEY.md §2.11, §7.3).
  *
  * Semantics: supports sign, weeks, days, hours, minutes, fractional seconds
  * (P[nW][nD][T[nH][nM][n.nS]]). Null/garbage/era components (years, months —
  * calendar-dependent, the reference would crash on them) → null, i.e.
  * coerce-style totality instead of the reference's raise-on-null
  * (SURVEY.md §2.1 O20 divergence note).
  *
  * Codegen: real `doGenCode` via a static parser call, so the expression
  * stays inside whole-stage codegen (no UDF serialization, no boxing in the
  * generated loop beyond the parse result).
  */
object Iso8601 {
  private val P: Pattern = Pattern.compile(
    "([+-])?P(?:(\\d+(?:\\.\\d+)?)W)?(?:(\\d+(?:\\.\\d+)?)D)?" +
      "(?:T(?:(\\d+(?:\\.\\d+)?)H)?(?:(\\d+(?:\\.\\d+)?)M)?(?:(\\d+(?:\\.\\d+)?)S)?)?")

  /** Static entry point shared by interpreted eval and generated code.
    * Returns null (boxed) on unparseable input. */
  def parseSeconds(s: UTF8String): java.lang.Double =
    if (s == null) null else parseSeconds(s.toString)

  def parseSeconds(s: String): java.lang.Double = {
    if (s == null) return null
    val m = P.matcher(s.trim)
    if (!m.matches()) return null
    // "P" alone (no components) is not a duration
    if ((2 to 6).forall(m.group(_) == null)) return null
    def g(i: Int, mult: Double): Double = {
      val v = m.group(i)
      if (v == null) 0.0 else v.toDouble * mult
    }
    val total = g(2, 604800d) + g(3, 86400d) + g(4, 3600d) + g(5, 60d) + g(6, 1d)
    val signed = if ("-" == m.group(1)) -total else total
    java.lang.Double.valueOf(signed)
  }

  /** Column API: iso8601_seconds($"duration") */
  def iso8601_seconds(c: Column): Column =
    GraftColumn.column(Iso8601Seconds(GraftColumn.expression(c)))

  /** SQL API: SELECT iso8601_seconds(duration) — idempotent registration. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "iso8601_seconds", exprs => Iso8601Seconds(exprs.head), "built-in")
}

case class Iso8601Seconds(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  // not nullIntolerant: non-null garbage still yields null
  override def nullIntolerant: Boolean = true // null in => null out holds
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"iso8601_seconds requires STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    Iso8601.parseSeconds(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("isoSecs")
      s"""
         |java.lang.Double $r = graft.expr.Iso8601.parseSeconds($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Iso8601Seconds =
    copy(child = newChild)

  override def prettyName: String = "iso8601_seconds"
}
