package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for IPv4 dotted-quad → u32 (reference OML
  * pipe `ip4_to_int`, needed for ip_geo range lookups — SURVEY.md §4
  * calls this out as one of the few custom expressions worth building).
  * A real Expression (with doGenCode) instead of a Scala UDF keeps it
  * inside whole-stage codegen and null-safe without boxing. */
case class Ip4ToInt(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val r = Ip4ToInt.parse(input.asInstanceOf[UTF8String].toString)
    if (r < 0) null else java.lang.Long.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         long r = graft.functions.Ip4ToInt.parse($c.toString());
         if (r < 0) { ${ev.isNull} = true; } else { ${ev.value} = r; }
       """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Ip4ToInt =
    copy(child = newChild)
}

object Ip4ToInt {
  /** Returns -1 for invalid addresses (null at the expression layer). */
  def parse(s: String): Long = {
    var acc = 0L; var octet = 0L; var digits = 0; var parts = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.') {
        if (digits == 0 || octet > 255 || parts >= 3) return -1L
        acc = (acc << 8) | octet; octet = 0; digits = 0; parts += 1
      } else if (c >= '0' && c <= '9') {
        octet = octet * 10 + (c - '0'); digits += 1
        if (digits > 3) return -1L
      } else return -1L
      i += 1
    }
    if (parts != 3 || digits == 0 || octet > 255) return -1L
    (acc << 8) | octet
  }

  def ip4_to_int(c: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(
      Ip4ToInt(org.apache.spark.sql.GraftExprBridge.expression(c)))
}
