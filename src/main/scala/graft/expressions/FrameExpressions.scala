package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftext.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native decode of the reference's 16-byte radio wire frame: 8 ×
  * uint16 little-endian (`ChannelData` memcpy'd onto the air,
  * `src/transmitter/main.cpp:104`) into `array<int>`.
  *
  * The receiver's byte-length guard (`src/receiver/main.cpp:30-35`:
  * packets whose length != sizeof(ChannelData) are rejected before the
  * memcpy) maps to NULL output — callers route null rows to a
  * dead-letter relation, mirroring the reference's reject-and-log.
  *
  * A codegen'd expression rather than a UDF: the decode sits on the
  * per-packet hot path of a packet-stream scan, and the generated loop
  * reads the bytes in place — no boxing, no Scala closure dispatch.
  * Exact inverse of `streaming.Sinks.packFrame` (round-trip asserted
  * in FrameExpressionsSpec).
  */
case class UnpackFrame(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true // length guard rejects -> null
  override def prettyName: String = "unpack_frame"

  private val FrameBytes = 16

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length != FrameBytes) null
    else {
      val vals = new Array[Int](8)
      var i = 0
      while (i < 8) {
        vals(i) = (b(2 * i) & 0xFF) | ((b(2 * i + 1) & 0xFF) << 8)
        i += 1
      }
      new GenericArrayData(vals)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val vals = ctx.freshName("vals")
      val i = ctx.freshName("i")
      s"""
         |if ($b.length != $FrameBytes) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $vals = new int[8];
         |  for (int $i = 0; $i < 8; $i++) {
         |    $vals[$i] = ($b[2 * $i] & 0xFF) | (($b[2 * $i + 1] & 0xFF) << 8);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($vals);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnpackFrame =
    copy(child = newChild)
}

/** Column-API surface for the wire-frame decode. */
object FrameFunctions {
  /** Decode a 16-byte LE wire frame to `array<int>`; NULL when the
    * payload fails the length guard (see [[UnpackFrame]]). */
  def unpackFrame(payload: Column): Column =
    SqlBridge.column(UnpackFrame(SqlBridge.expression(payload)))
}
