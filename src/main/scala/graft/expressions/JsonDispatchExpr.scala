package graft.expressions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass JSON type detection — the fast path for go-fish's trial
  * decode (reference: event_types.go:52-65, SURVEY §7.3's optional
  * Catalyst work).
  *
  * The declarative dispatch evaluates one `from_json` per registered
  * schema inside the first-match CASE chain, i.e. a multi-schema
  * registry parses every record up to N times just to LABEL it. This
  * expression parses ONCE (Jackson), then checks each type's required
  * fields for presence and type-compatibility in registry order.
  * Type-compatibility mirrors Spark's JacksonParser PERMISSIVE rules
  * for the field kinds the registry uses (string accepts anything,
  * timestamps accept Spark-parseable strings — via Spark's own
  * `DateTimeUtils.stringToTimestamp` — or integral epochs, structs
  * need objects, etc.). Equality with the from_json-based dispatch is
  * asserted in `DecodeSpec`.
  */
object JsonDispatch {

  /** (typeName, required fields as (name, kind)); kind ∈ string,
    * timestamp, number, bool, struct, array, any. A type with no
    * required fields always matches (the raw catch-all).
    */
  type TypeSpec = Array[(String, Array[(String, String)])]

  def kindOf(dt: DataType): String = dt match {
    case StringType                       => "string"
    case TimestampType | TimestampNTZType => "timestamp"
    case _: NumericType                   => "number"
    case BooleanType                      => "bool"
    case _: StructType | _: MapType       => "struct"
    case _: ArrayType                     => "array"
    case _                                => "any"
  }

  private val mapperLocal: ThreadLocal[ObjectMapper] = new ThreadLocal[ObjectMapper] {
    override def initialValue(): ObjectMapper = new ObjectMapper()
  }

  private def fieldOk(node: JsonNode, field: String, kind: String): Boolean = {
    val f = node.get(field)
    if (f == null || f.isNull) return false
    kind match {
      case "string" => true // JacksonParser renders any value as text (objects keep raw JSON)
      case "timestamp" =>
        (f.isTextual && DateTimeUtils.stringToTimestamp(
          UTF8String.fromString(f.textValue()),
          java.time.ZoneOffset.UTC
        ).isDefined) || f.isIntegralNumber // epoch seconds, JacksonParser semantics
      case "number" => f.isNumber
      case "bool"   => f.isBoolean
      case "struct" => f.isObject
      case "array"  => f.isArray
      case _        => true
    }
  }

  /** First matching type name, null if none (or not a JSON object). */
  def typeOf(value: UTF8String, types: TypeSpec): UTF8String = {
    var node: JsonNode = null
    var parsed = false
    var i = 0
    while (i < types.length) {
      val (name, required) = types(i)
      if (required.isEmpty) return UTF8String.fromString(name) // raw catch-all
      if (!parsed) {
        parsed = true
        node =
          try mapperLocal.get().readTree(value.toString)
          catch { case _: Exception => null }
        if (node != null && !node.isObject) node = null
      }
      if (node != null) {
        var ok = true
        var j = 0
        while (ok && j < required.length) {
          ok = fieldOk(node, required(j)._1, required(j)._2)
          j += 1
        }
        if (ok) return UTF8String.fromString(name)
      }
      i += 1
    }
    null
  }
}

case class JsonTypeOfExpr(child: Expression, types: JsonDispatch.TypeSpec) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // no type may claim the record
  override def prettyName: String = "json_type_of"
  override protected def nullSafeEval(input: Any): Any =
    JsonDispatch.typeOf(input.asInstanceOf[UTF8String], types)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("types", types, "scala.Tuple2[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.JsonDispatch.typeOf($c, (scala.Tuple2[]) $ref);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object JsonTypeOfExpr {
  def column(value: Column, types: JsonDispatch.TypeSpec): Column =
    GraftSqlBridge.column(JsonTypeOfExpr(GraftSqlBridge.expression(value), types))
}
