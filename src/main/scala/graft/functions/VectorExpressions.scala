package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: sequential dot product of two double arrays.
  *
  * This is the hot scalar of the similarity surface (SURVEY §2 [X]): an
  * all-pairs near-dup join evaluates it millions of times. The built-in
  * route (`aggregate(zip_with(...))`) runs interpreted lambdas per element
  * (~200 ns/element); this expression is a primitive `while` loop in both
  * the interpreted path and the generated code, keeping the whole pair
  * pipeline inside whole-stage codegen. Fold order is left-to-right, so
  * results are bit-identical to the higher-order form (and to DuckDB's
  * `list_dot_product` oracle twin).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // (return type inferred: AbstractDataType is private[sql] in Spark 4)
  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: intersection size of two ascending-sorted
  * long arrays via a linear merge — no per-call hash set, no boxing.
  *
  * This is the verification kernel of the exact all-pairs Jaccard join:
  * millions of candidate pairs each compare two ~50-element gram-id
  * arrays. `array_intersect` builds a hash set of boxed elements per call
  * (and on string grams also hashes every string); the merge is two
  * pointers over primitive longs and stays inside whole-stage codegen.
  * Both inputs MUST be sorted ascending (the caller's dictionary encode +
  * `array_sort` guarantees it); duplicates are counted once per matching
  * rank, which is set semantics when inputs are distinct.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xi = $a.getLong($i);
         |  long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: sparse weighted dot product over two
  * PACKED sorted long arrays — each element encodes (key << 16) | weight
  * with the weight in [0, 65535], so a sparse integer vector rides a
  * single primitive array (no struct rows, no parallel-array alignment,
  * no interpreted transforms at set-build time). A two-pointer merge on
  * the key halves accumulates weight products at matching keys.
  *
  * This is the verification kernel of the exact all-pairs COSINE join
  * (the tf-weighted sibling of [[SortedIntersectCount]]): arrays must be
  * sorted ascending (keys are unique per vector, and the key occupies the
  * high bits, so sorting packed values IS sorting keys) and non-null.
  */
case class PackedWeightedDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_packed_weighted_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var s = 0L
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      val kx = xi >>> 16; val ky = yj >>> 16
      if (kx == ky) { s += (xi & 0xffffL) * (yj & 0xffffL); i += 1; j += 1 }
      else if (kx < ky) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      val kx = ctx.freshName("kx")
      val ky = ctx.freshName("ky")
      s"""
         |int $i = 0; int $j = 0; long $s = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xi = $a.getLong($i);
         |  long $yj = $b.getLong($j);
         |  long $kx = $xi >>> 16; long $ky = $yj >>> 16;
         |  if ($kx == $ky) { $s += ($xi & 0xffffL) * ($yj & 0xffffL); $i++; $j++; }
         |  else if ($kx < $ky) { $i++; } else { $j++; }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackedWeightedDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Codegen'd sequential dot product over `array<double>` columns. */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd merge-intersection count over sorted `array<long>` columns. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd sparse weighted dot over packed sorted `array<long>`. */
  def packedWeightedDot(a: Column, b: Column): Column =
    ColumnBridge.column(PackedWeightedDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
