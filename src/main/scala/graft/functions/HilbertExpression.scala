package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: HILBERT curve index of a 2-D cell — the
  * locality-preserving alternative to the Z-order interleave
  * (`ops/StorageLayout.zValue`): consecutive Hilbert indices are always
  * MANHATTAN-ADJACENT cells (step 1), where the Z curve takes long
  * diagonal jumps at power-of-two boundaries — so range scans over a
  * Hilbert-clustered layout touch strictly fewer files for the same 2-D
  * window (the classic Hilbert-vs-Morton layout result; e.g. Moon et
  * al. 2001, "Analysis of the clustering properties of the Hilbert
  * space-filling curve").
  *
  * The standard bit-level walk (rx/ry extraction, quadrant offset
  * `s²·((3·rx) ⊕ ry)`, conditional reflect+swap — the public-domain
  * d2xy/xy2d formulation) runs as a primitive loop in both the
  * interpreted path and generated code: `order` iterations of integer
  * ops, fully inside whole-stage codegen. Inputs MUST lie in
  * [0, 2^order) — enforced with a loud IllegalArgumentException in both
  * the interpreted and generated paths (an out-of-range coordinate
  * would otherwise yield a silently non-injective index). The
  * exhaustive adjacency spec pins correctness, the q199 recursive-CTE
  * twin pins cross-engine parity.
  */
case class HilbertIndex(left: Expression, right: Expression, order: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  require(order >= 1 && order <= 31, "HilbertIndex: order in [1, 31]")

  override def inputTypes = Seq(LongType, LongType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    // Enforce the documented domain loudly (the codecs' require
    // discipline): an out-of-range coordinate would silently yield a
    // non-injective index and cluster a layout on garbage keys.
    if (x < 0L || x >= (1L << order) || y < 0L || y >= (1L << order))
      throw new IllegalArgumentException(
        s"graft_hilbert: coordinates ($x, $y) outside [0, 2^$order)")
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a;
         |long $y = $b;
         |if ($x < 0L || $x >= (1L << $order) || $y < 0L || $y >= (1L << $order)) {
         |  throw new IllegalArgumentException(
         |    "graft_hilbert: coordinates (" + $x + ", " + $y + ") outside [0, 2^$order)");
         |}
         |long $d = 0L;
         |for (long $s = 1L << ${order - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) != 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) != 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  def apply(x: Column, y: Column, order: Int): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expression(x), ColumnBridge.expression(y), order))
}
