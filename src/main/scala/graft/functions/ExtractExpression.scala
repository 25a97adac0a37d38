package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.{DictScanner, Extract}

/**
 * E2 as a native Catalyst expression: text -> array<struct<kind, surface,
 * norm, lon, lat>> of extracted mentions. Replaces the ScalaUDF variant —
 * the output rows are built directly as InternalRows, skipping the encoder
 * converter layer a UDF pays per row. The broadcast dictionary handle is a
 * constructor field, so the expression serializes into the physical plan and
 * executors fetch the dictionary blocks once (standard Broadcast semantics).
 *
 * CodegenFallback is deliberate: the per-row cost is the regex/trie scan,
 * not expression dispatch, and fallback keeps the surrounding operators
 * inside WholeStageCodegen.
 */
case class ExtractMentionsExpr(child: Expression, scanner: Broadcast[DictScanner])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ExtractMentionsExpr.schema
  override def nullable: Boolean = false

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    // ZERO-COPY byte-level scan: when the UTF8String is backed by a heap
    // byte[] (UnsafeRow / parquet readers), scan and digest the backing
    // array in place — the page text is never copied, never decoded, and
    // produces no per-token garbage. This is the memory-traffic lever on the
    // string-bound extraction workload (the 2->8-core scaling limiter).
    val base = u.getBaseObject
    val rawOff = u.getBaseOffset - org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    val (bytes, off, len) =
      if (base.isInstanceOf[Array[Byte]] && rawOff >= 0 && rawOff <= Int.MaxValue)
        (base.asInstanceOf[Array[Byte]], rawOff.toInt, u.numBytes)
      else { val b = u.getBytes; (b, 0, b.length) }
    val ms = Extract.extractAllBytes(bytes, off, len, scanner.value)
    val arr = new Array[Any](ms.length)
    var i = 0
    while (i < ms.length) {
      val m = ms(i)
      arr(i) = InternalRow(
        UTF8String.fromString(m.kind),
        UTF8String.fromString(m.surface),
        if (m.norm == null) null else UTF8String.fromString(m.norm),
        if (m.lon == null) null else m.lon.doubleValue(),
        if (m.lat == null) null else m.lat.doubleValue())
      i += 1
    }
    // sha over the SAME bytes (byte-identity invariant) — fused here so the
    // page text bytes are touched exactly once per page, in place
    InternalRow(
      UTF8String.fromString(graft.geo.Geo.sha256HexBytes(bytes, off, len)),
      new GenericArrayData(arr))
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null)
      InternalRow(null, new GenericArrayData(Array.empty[Any]))
    else nullSafeEval(v)
  }

  override protected def withNewChildInternal(newChild: Expression): ExtractMentionsExpr =
    copy(child = newChild)
}

object ExtractMentionsExpr {
  val mentionsSchema: DataType = ArrayType(StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("surface", StringType, nullable = false),
    StructField("norm", StringType, nullable = true),
    StructField("lon", DoubleType, nullable = true),
    StructField("lat", DoubleType, nullable = true))), containsNull = false)

  val schema: DataType = StructType(Seq(
    StructField("text_sha256", StringType, nullable = true),
    StructField("mentions", mentionsSchema, nullable = false)))
}
