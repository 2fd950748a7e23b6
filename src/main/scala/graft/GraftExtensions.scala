package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{Ip4ToInt, ParseWpl, SplitMix64}

/** SparkSessionExtensions entry point — registers the engine's custom
  * expressions for SQL use:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT ip4_to_int(ip), parse_wpl(line, '<wpl source>') FROM logs
  *
  * (Scala callers can use graft.functions.Ip4ToInt.ip4_to_int /
  * ParseWpl.parse_wpl directly without the extension.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("ip4_to_int"),
      new ExpressionInfo(classOf[Ip4ToInt].getName, "ip4_to_int"),
      (args: Seq[Expression]) => Ip4ToInt(args.head)))
    e.injectFunction((
      FunctionIdentifier("parse_wpl"),
      new ExpressionInfo(classOf[ParseWpl].getName, "parse_wpl"),
      (args: Seq[Expression]) => {
        val src = args(1) match {
          case Literal(s: UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"parse_wpl: second argument must be a string literal, got $other")
        }
        ParseWpl(args.head, src)
      }))
    e.injectFunction((
      FunctionIdentifier("splitmix64"),
      new ExpressionInfo(classOf[SplitMix64].getName, "splitmix64"),
      (args: Seq[Expression]) => SplitMix64(args.head)))
  }
}
