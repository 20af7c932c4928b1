package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word w-shingles of a text column as one native expression.
  *
  * Semantics identical to the declarative formulation
  *   array_distinct(transform(sequence(1, greatest(n-w+1, 1)),
  *     i -> concat_ws(' ', slice(split(trim(text), '\s+'), i, w))))
  * — but that chain evaluates four interpreted higher-order/collection
  * ops per row and dominated dedup runtime. Here the whole construction
  * is a single JVM pass per row, and `doGenCode` emits a direct static
  * call into that kernel: unlike the earlier CodegenFallback, generated
  * stages pass the UTF8String straight through — no per-row InternalRow
  * materialization, no interpreted-eval detour — so the text/dedup
  * family stays fully inside whole-stage codegen.
  */
case class WordShingles(child: Expression, width: Int,
    distinct: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string column, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], width, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      // Scala-object entry point via MODULE$ — resolvable from Janino
      // without relying on static forwarders.
      s"${ev.value} = graft.expressions.WordShingles$$.MODULE$$" +
        s".compute($c, $width, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(text: Column, width: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(text), width))
  def apply(text: Column, width: Int, distinct: Boolean): Column =
    GraftSqlBridge.column(
      WordShingles(GraftSqlBridge.expression(text), width, distinct))

  /** SQL-trim: strips ONLY ' ' (0x20), exactly like Spark/DuckDB `trim`.
    * Java String.trim also strips \t\n\r (all chars <= 0x20), which would
    * tokenize tab/newline-padded text differently from the declarative
    * split(trim(text),'\s+') chain this expression must mirror.
    */
  private def sqlTrim(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  /** Row kernel shared by interpreted eval and generated code. */
  def compute(input: UTF8String, width: Int, distinct: Boolean): GenericArrayData = {
    // limit -1 matches Spark's split() (keeps trailing empties; moot
    // after trim but keeps parity exact).
    val toks = sqlTrim(input.toString).split("\\s+", -1)
    val m = math.max(toks.length - width + 1, 1)
    val acc = new java.util.LinkedHashSet[String](m * 2)
    val all = if (distinct) null else new Array[Any](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder
      var j = i
      val end = math.min(i + width, toks.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      if (distinct) acc.add(sb.toString)
      else all(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    if (!distinct) return new GenericArrayData(all)
    val out = new Array[Any](acc.size)
    val it = acc.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
