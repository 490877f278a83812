package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import graft.index.CellSpace

/** Custom codegen'd Catalyst expressions for the engine's hot scalar ops:
  * Morton keys, cell ids, and the exact point-in-polygon test. All stay
  * inside whole-stage codegen (doGenCode emits a static call into our
  * library — no boxing, no UDF serialization).
  */

/** 64-bit Morton (Z-order) key of two double coordinates normalized into
  * `space` — the engine's clustering key (reference semantic:
  * filters.mortonorder, MortonOrderFilter.cpp:64-123, normalize then
  * most-significant-bit-interleave ordering). */
case class MortonKey(left: Expression, right: Expression, space: CellSpace)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "morton_key"
  override protected def nullSafeEval(x: Any, y: Any): Any = {
    val ix = space.ixAt(x.asInstanceOf[Double])
    val iy = space.iyAt(y.asInstanceOf[Double])
    graft.index.Morton.interleave(ix, iy)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sp = ctx.addReferenceObj("space", space, classOf[CellSpace].getName)
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.index.Morton.interleave($sp.ixAt($x), $sp.iyAt($y));")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Level-tagged cell id containing (x, y) at `level` on the resolution
  * ladder — the partition/join key of every spatial operator. */
case class CellId(left: Expression, right: Expression, space: CellSpace, level: Int)
    extends BinaryExpression with Serializable {
  require(level >= 0 && level <= CellSpace.MaxPackLevel, s"bad level $level")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_id"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    space.cellAt(x.asInstanceOf[Double], y.asInstanceOf[Double], level)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sp = ctx.addReferenceObj("space", space, classOf[CellSpace].getName)
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = $sp.cellAt($x, $y, $level);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Exact point-in-polygon against a constant geometry (WKB), via an
  * executor-side PreparedGeometry cache — the Spark twin of the
  * reference's prepared-GEOS-contains per point (CropFilter.cpp:242-270)
  * with preparation hoisted out of the row loop (CropFilter.cpp:137-142).
  * The WKB literal rides the plan; each executor prepares once. */
case class STContainsXY(left: Expression, right: Expression, wkb: Array[Byte],
                        prefiltered: Boolean = false)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_contains_xy"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    graft.index.GeomCache.containsXY(wkb, x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytes = ctx.addReferenceObj("wkb", wkb, "byte[]")
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.index.GeomCache.containsXY($bytes, $x, $y);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Point-in-polygon where the geometry arrives as a WKB column (the
  * attribute join's per-feature geometry). The executor-side cache still
  * prepares each distinct geometry once. */
case class STContainsDyn(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_contains_dyn"
  override protected def nullSafeEval(wkb: Any, x: Any, y: Any): Any =
    graft.index.GeomCache.containsXY(wkb.asInstanceOf[Array[Byte]],
      x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, x, y) =>
      s"${ev.value} = graft.index.GeomCache.containsXY($w, $x, $y);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Single-pass parser for the point-span payload ("xi,yi,zi,intensity,
  * pid" as ASCII ints) — replaces split() + five string->long casts
  * (an array allocation plus per-field UTF8String casts per point) with
  * one scan over the bytes. Returns struct<xi,yi,zi,intensity,pid:long>.
  * The hot inner loop of every doc-table scan. */
case class ParsePointPayload(child: Expression) extends UnaryExpression with Serializable {
  import org.apache.spark.sql.catalyst.InternalRow
  override def dataType: DataType = ParsePointPayload.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "parse_point_payload"
  override protected def nullSafeEval(v: Any): Any =
    ParsePointPayload.parse(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ParsePointPayload.parse($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ParsePointPayload {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  val schema: StructType = StructType(Seq(
    StructField("xi", LongType, nullable = false),
    StructField("yi", LongType, nullable = false),
    StructField("zi", LongType, nullable = false),
    StructField("intensity", LongType, nullable = false),
    StructField("pid", LongType, nullable = false)))

  def parse(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val out = new Array[Any](5)
    var field = 0
    var acc = 0L
    var neg = false
    var i = 0
    while (i < bytes.length && field < 5) {
      val b = bytes(i)
      if (b == ',') { out(field) = if (neg) -acc else acc; field += 1; acc = 0L; neg = false }
      else if (b == '-') neg = true
      else acc = acc * 10 + (b - '0')
      i += 1
    }
    if (field < 5) { out(field) = if (neg) -acc else acc; field += 1 }
    while (field < 5) { out(field) = 0L; field += 1 }
    new GenericInternalRow(out)
  }
}

/** O(1) driver-built lookup table keyed by a long column. Replaces the
  * `map(lit(k1), lit(v1), ...)` CreateMap idiom for driver-loop
  * broadcast state (chipper cut keys, per-node split decisions):
  * CreateMap embeds 2m literal child expressions that (a) evaluate by
  * LINEAR scan per row, (b) serialize into every task binary as a full
  * expression tree, and (c) get re-rendered into plan strings on every
  * AQE stage update — all three costs grow with m, and the rendering
  * alone dominated the chipper's wall time at m≈150. This expression
  * carries one shared HashMap reference (O(1) probe, compact
  * serialization, constant-size toString). Missing key -> null,
  * matching GetMapValue's semantics. Values must already be in
  * Catalyst internal format (UTF8String for strings). */
case class LongMapLookupExpr(child: Expression,
                             table: java.util.HashMap[java.lang.Long, Object],
                             valueType: DataType, tag: String)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = valueType
  override def nullable: Boolean = true
  override def prettyName: String = s"lookup_$tag"
  // default UnaryExpression.toString renders prettyName(child) — the
  // table itself never reaches a plan string
  override protected def nullSafeEval(k: Any): Any =
    table.get(k.asInstanceOf[java.lang.Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("lookupTable", table, "java.util.HashMap")
    val boxed = valueType match {
      case BooleanType => "java.lang.Boolean"
      case IntegerType => "java.lang.Integer"
      case LongType    => "java.lang.Long"
      case DoubleType  => "java.lang.Double"
      case StringType  => "org.apache.spark.unsafe.types.UTF8String"
      case dt => throw new IllegalArgumentException(s"lookup value type $dt")
    }
    val unbox = valueType match {
      case BooleanType => ".booleanValue()"
      case IntegerType => ".intValue()"
      case LongType    => ".longValue()"
      case DoubleType  => ".doubleValue()"
      case _           => ""
    }
    val c = child.genCode(ctx)
    val o = ctx.freshName("looked")
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
      new StringContext(
        s"""
           |${c.code}
           |boolean ${ev.isNull} = true;
           |${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(valueType)} ${ev.value} =
           |  ${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.defaultValue(valueType)};
           |if (!${c.isNull}) {
           |  Object $o = $tbl.get(${c.value});
           |  if ($o != null) { ${ev.isNull} = false; ${ev.value} = (($boxed) $o)$unbox; }
           |}
           |""".stripMargin)).code())
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SpatialFunctions {
  private def expr(c: Column): Expression = ExpressionUtils.expression(c)
  private def col(e: Expression): Column = ExpressionUtils.column(e)

  /** Column builder for [[LongMapLookupExpr]]: `entries` values may be
    * Boolean/Int/Long/Double/String (strings converted to internal
    * UTF8String here). */
  def longLookup(key: Column, entries: Seq[(Long, Any)], valueType: DataType,
                 tag: String): Column = {
    val t = new java.util.HashMap[java.lang.Long, Object](entries.size * 2)
    entries.foreach { case (k, v) =>
      val internal: Object = v match {
        case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
        case o => o.asInstanceOf[Object]
      }
      t.put(k, internal)
    }
    col(LongMapLookupExpr(expr(key), t, valueType, tag))
  }

  def mortonKey(x: Column, y: Column, space: CellSpace = CellSpace.default): Column =
    col(MortonKey(expr(x), expr(y), space))

  def cellId(x: Column, y: Column, level: Int, space: CellSpace = CellSpace.default): Column =
    col(CellId(expr(x), expr(y), space, level))

  /** Operator-internal exact test: marked prefiltered — the operators
    * build their own bbox/cover machinery, so the optimizer rule must
    * not wrap another one around it. */
  def stContainsXY(wkb: Array[Byte], x: Column, y: Column): Column =
    col(STContainsXY(expr(x), expr(y), wkb, prefiltered = true))
}
