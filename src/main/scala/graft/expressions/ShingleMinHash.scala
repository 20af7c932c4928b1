package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Lexicographic min of md5 over rolling word w-shingles — the document
  * fingerprint kernel (winnowing-style), as ONE native expression.
  *
  * Semantically identical to
  *   array_min(transform(sequence(1, greatest(n-w+1, 1)),
  *     i -> md5(concat_ws(' ', slice(split(trim(text),'\s+'), i, w)))))
  * but that chain interprets four collection ops + an md5 PER ELEMENT
  * (profiled as the hottest query in the corpus family). Here: tokenize
  * once, digest each shingle, keep the running min — no intermediate
  * arrays, no interpreted lambdas, and `doGenCode` keeps host stages in
  * whole-stage codegen. Hex min == UTF8 binary min == DuckDB varchar
  * min, so the oracle replays it with the declarative SQL.
  */
case class ShingleMinHash(child: Expression, width: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "shingle_min_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_min_hash expects a string column, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    ShingleMinHash.compute(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ShingleMinHash$$.MODULE$$" +
        s".compute($c, $width);")

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

object ShingleMinHash {
  def apply(text: Column, width: Int): Column =
    GraftSqlBridge.column(ShingleMinHash(GraftSqlBridge.expression(text), width))

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Row kernel shared by interpreted eval and generated code: min hex
    * md5 over the m = max(nTok-w+1, 1) rolling shingles (short docs
    * hash what's there, same as the shingle ops).
    */
  def compute(input: UTF8String, width: Int): UTF8String = {
    val s = input.toString
    // SQL-trim (' ' only) + split, identical to WordShingles.compute
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    val toks = s.substring(from, to).split("\\s+", -1)
    val m = math.max(toks.length - width + 1, 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    var best: String = null
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
      val dig = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexDigits((dig(b) >> 4) & 0xf)
        hex(2 * b + 1) = HexDigits(dig(b) & 0xf)
        b += 1
      }
      val h = new String(hex)
      if (best == null || h.compareTo(best) < 0) best = h
      i += 1
    }
    UTF8String.fromString(best)
  }
}
