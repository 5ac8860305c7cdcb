package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `logfmt_map(line)` — single-pass logfmt tokenizer as a NATIVE Catalyst
  * expression (reference logfmt use: tags parsing search_filter.rs:184-232,
  * LogQL logfmt stage ast.rs:65). One scan of the line yields every k=v
  * pair as a map<string,string>; per-key extraction then becomes a map
  * lookup, so a pipeline extracting N keys parses the line ONCE instead of
  * running N anchored regexes over it — and whole-stage codegen's
  * subexpression elimination shares the parse across all N lookups in the
  * same projection. `doGenCode` emits a direct static call (no regex, no
  * UDF serialization), keeping the operator inside WholeStageCodegen.
  *
  * Token rules (mirroring the per-key regex `(?:^|\s)k=("[^"]*"|\S+)`,
  * except that a quoted value is consumed atomically, so `key=` text
  * INSIDE a quoted value is never mis-parsed as a pair):
  *   - pairs split on whitespace runs; a token without '=' is skipped
  *   - key = chars before the FIRST '='; value = the rest, RAW (quotes
  *     kept — callers strip, preserving each surface's semantics)
  *   - a value opening with '"' runs to the next '"' (crossing spaces);
  *     unterminated quotes fall back to the bare `\S+` read
  *   - empty values don't record the key; the FIRST recorded occurrence
  *     of a key wins (regex first-match parity)
  */
case class LogfmtMap(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)
  override def prettyName: String = "logfmt_map"

  override def nullSafeEval(input: Any): Any =
    LogfmtMap.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LogfmtMap.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): LogfmtMap =
    copy(child = newChild)
}

object LogfmtMap {

  /** lift to the public Column algebra */
  def logfmtMap(c: Column): Column =
    GraftShim.column(LogfmtMap(GraftShim.expression(c)))

  /** single left-to-right scan; called from generated code per row. */
  def parse(line: UTF8String): MapData = {
    val s = line.toString
    val n = s.length
    val keys = new java.util.ArrayList[AnyRef](8)
    val values = new java.util.ArrayList[AnyRef](8)
    val seen = new java.util.HashSet[String](16)
    var i = 0
    while (i < n) {
      // skip whitespace between tokens
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < n) {
        val tokStart = i
        // key = run of non-space chars up to the first '='
        var eq = -1
        while (i < n && !Character.isWhitespace(s.charAt(i)) && eq < 0) {
          if (s.charAt(i) == '=') eq = i else i += 1
        }
        if (eq < 0) {
          // no '=' in token — skip it entirely
          while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
        } else {
          val key = s.substring(tokStart, eq)
          i = eq + 1
          val vStart = i
          var vEnd = i
          if (i < n && s.charAt(i) == '"') {
            val close = s.indexOf('"', i + 1)
            if (close >= 0) {
              // quoted value, atomic across whitespace; keep the quotes
              vEnd = close + 1
              i = close + 1
              // trailing garbage up to whitespace is consumed, not parsed
              while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
            } else {
              // unterminated quote: bare \S+ fallback from the quote char
              while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
              vEnd = i
            }
          } else {
            while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
            vEnd = i
          }
          if (vEnd > vStart && key.nonEmpty && seen.add(key)) {
            keys.add(UTF8String.fromString(key))
            values.add(UTF8String.fromString(s.substring(vStart, vEnd)))
          }
        }
      }
    }
    new ArrayBasedMapData(
      new GenericArrayData(keys.toArray),
      new GenericArrayData(values.toArray))
  }
}
