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
  *
  * Type-compatibility mirrors Spark's JacksonParser PERMISSIVE rules
  * per concrete DataType: integral types reject fractional/overflowing
  * JSON numbers (JacksonParser nulls the field → record unclaimed),
  * container types only need the right shape (PERMISSIVE nulls the
  * individual LEAF on a nested mismatch, never the enclosing struct),
  * and timestamp strings parse with the session time zone exactly as
  * from_json's default formatter does (`DefaultTimestampFormatter`
  * delegates to `DateTimeUtils.stringToTimestamp`). Equality with the
  * from_json-based dispatch is asserted in `DecodeSpec`, including on
  * adversarial rows (fractional ints, overflow, bad nested subfields,
  * partial timestamps, wrong-typed leaves).
  */
object JsonDispatch {

  /** (typeName, required fields as (name, dataType)). A type with no
    * required fields always matches (the raw catch-all).
    */
  type TypeSpec = Array[(String, Array[(String, DataType)])]

  private val mapperLocal: ThreadLocal[ObjectMapper] = new ThreadLocal[ObjectMapper] {
    override def initialValue(): ObjectMapper = {
      val m = new ObjectMapper()
      // from_json's JSONOptions default these two parser features ON
      // (and only these two) — a single-quoted record or a bare NaN
      // token must label identically on both dispatch paths.
      m.configure(com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_SINGLE_QUOTES, true)
      m.configure(com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_NON_NUMERIC_NUMBERS, true)
      m
    }
  }

  /** Non-numeric double/float spellings from JacksonParser
    * (allowNonNumericNumbers, on by default for from_json).
    */
  private val nonNumerics = Set("NaN", "+INF", "-INF", "Infinity", "+Infinity", "-Infinity")

  /** Would JacksonParser (PERMISSIVE) convert this present, non-null
    * node to `dt` without nulling it? Mirrors
    * sql/catalyst/json/JacksonParser.makeConverter per branch.
    */
  private def compat(f: JsonNode, dt: DataType, zone: java.time.ZoneId): Boolean = dt match {
    case StringType => true // any token renders as text (objects keep raw JSON)
    case BooleanType => f.isBoolean
    case ByteType =>
      // Jackson's getByteValue accepts the unsigned-extended range
      // [-128, 255] and wraps 128..255 to negative (JACKSON-804), and
      // JacksonParser converts bytes through it — mirror that, not the
      // signed byte range.
      f.isIntegralNumber && f.canConvertToInt &&
        f.intValue() >= Byte.MinValue && f.intValue() <= 255
    case ShortType =>
      f.isIntegralNumber && f.canConvertToInt &&
        f.intValue() >= Short.MinValue && f.intValue() <= Short.MaxValue
    case IntegerType => f.isIntegralNumber && f.canConvertToInt
    case LongType    => f.isIntegralNumber && f.canConvertToLong
    case FloatType | DoubleType =>
      f.isNumber || (f.isTextual && nonNumerics.contains(f.textValue()))
    case dt: DecimalType =>
      // JacksonParser accepts number tokens AND decimal strings, then
      // nulls values whose rounded precision overflows the declared
      // (p, s) — mirror both sides.
      val bd: java.math.BigDecimal =
        if (f.isNumber) f.decimalValue()
        else if (f.isTextual) {
          try new java.math.BigDecimal(f.textValue())
          catch { case _: NumberFormatException => null }
        } else null
      bd != null &&
        bd.setScale(dt.scale, java.math.RoundingMode.HALF_UP).precision() <= dt.precision
    case TimestampType =>
      (f.isTextual && DateTimeUtils
        .stringToTimestamp(UTF8String.fromString(f.textValue()), zone)
        .isDefined) ||
        (f.isIntegralNumber && f.canConvertToLong) // epoch seconds
    case TimestampNTZType =>
      f.isTextual && DateTimeUtils
        .stringToTimestampWithoutTimeZone(UTF8String.fromString(f.textValue()), false)
        .isDefined
    case DateType =>
      f.isTextual && DateTimeUtils.stringToDate(UTF8String.fromString(f.textValue())).isDefined
    // PERMISSIVE partial results null individual LEAVES, not their
    // ancestors (verified against from_json in DecodeSpec: certStream
    // `data` survives a fractional `data.cert_index`) — so container
    // fields only need the right shape; bad nested values never null
    // the required container itself.
    case _: StructType | _: MapType => f.isObject
    case _: ArrayType               => f.isArray
    case _                          => true
  }

  private def fieldOk(node: JsonNode, field: String, dt: DataType, zone: java.time.ZoneId): Boolean = {
    val f = node.get(field)
    f != null && !f.isNull && compat(f, dt, zone)
  }

  // Single-entry zone cache: typeOf runs per record and getZoneId
  // parses the id each call; one session uses one zone in practice.
  // The (id, zone) pair is ONE volatile reference so concurrent tasks
  // with different session zones can never mix one cache's id with the
  // other's zone — worst case under contention is a recompute.
  @volatile private var cachedZone: (String, java.time.ZoneId) = null
  private def zoneFor(zoneId: String): java.time.ZoneId = {
    val c = cachedZone
    if (c != null && c._1 == zoneId) c._2
    else {
      val z = DateTimeUtils.getZoneId(zoneId)
      cachedZone = (zoneId, z)
      z
    }
  }

  /** First matching type name, null if none (or not a JSON object).
    * @param zoneId session time zone (from_json parses timestamps with
    *               the session zone's formatter)
    */
  def typeOf(value: UTF8String, types: TypeSpec, zoneId: String): UTF8String = {
    val zone = zoneFor(zoneId)
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
          ok = fieldOk(node, required(j)._1, required(j)._2, zone)
          j += 1
        }
        if (ok) return UTF8String.fromString(name)
      }
      i += 1
    }
    null
  }
}

// The type spec is an IndexedSeq, not the kernel's Array form: an Array
// parameter gives the case class identity-based equals/hashCode, so two
// nodes built from content-equal registries would never canonicalize
// together and Catalyst's subexpression reuse would silently miss.
case class JsonTypeOfExpr(
    child: Expression,
    types: IndexedSeq[(String, IndexedSeq[(String, DataType)])],
    zoneId: String
) extends UnaryExpression {
  private lazy val spec: JsonDispatch.TypeSpec =
    types.map { case (n, req) => n -> req.toArray }.toArray
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // no type may claim the record
  override def prettyName: String = "json_type_of"
  override protected def nullSafeEval(input: Any): Any =
    JsonDispatch.typeOf(input.asInstanceOf[UTF8String], spec, zoneId)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("types", spec, "scala.Tuple2[]")
    val zid = ctx.addReferenceObj("zoneId", zoneId, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.JsonDispatch.typeOf($c, (scala.Tuple2[]) $ref, $zid);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object JsonTypeOfExpr {
  def column(value: Column, types: JsonDispatch.TypeSpec, zoneId: String): Column =
    GraftSqlBridge.column(
      JsonTypeOfExpr(
        GraftSqlBridge.expression(value),
        types.map { case (n, req) => (n, req.toIndexedSeq) }.toIndexedSeq,
        zoneId
      )
    )
}
