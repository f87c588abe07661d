package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the embedding hot path (SURVEY.md §4.2).
  *
  * The HOF compositions (`aggregate(zip_with(...))`) are codegen'd but
  * traverse `ArrayData` element-by-element through boxed lambda calls and
  * allocate an intermediate array per row-pair; on a 64-dim corpus the
  * similarity stages spend most of their time there. These expressions
  * generate tight primitive loops instead (no allocation, no boxing) and
  * stay inside whole-stage codegen, with an interpreted `eval` fallback for
  * non-codegen contexts. Arithmetic is the same left-to-right sequential
  * fold as the HOF form AND the DuckDB oracle's `list_dot_product`, so
  * results are bitwise-identical to both.
  *
  * The reference engine has no expression layer at all (string KV pairs,
  * `/root/reference/src/tmapreduce/job.h:17-24`); this is where a
  * Spark-native design pays: one `Expression` subclass and every plan that
  * scores vectors gets a fused SIMD-friendly loop.
  */
object VectorExprs {

  /** `dot(a, b)`: sequential-fold dot product of two `array<double>`. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductD(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** `norm(a)`: L2 norm, same fold order as `sqrt(dot(a, a))`. */
  def norm(a: Column): Column = {
    val e = ColumnBridge.expression(a)
    ColumnBridge.column(org.apache.spark.sql.catalyst.expressions.Sqrt(DotProductD(e, e)))
  }

  /** `signSketch(v)`: multi-table random-hyperplane sign sketch —
    * `tables` longs, bit i of table t = sign of `dot(v, planes(t*bits+i))`.
    * One fused pass; replaces a tables×bits-fold HOF pipeline.
    */
  def signSketch(v: Column, planes: Seq[Seq[Double]], tables: Int, bits: Int): Column =
    ColumnBridge.column(SignSketch(ColumnBridge.expression(v), planes, tables, bits))

  /** `centroidDists(v)`: squared L2 distance from `v` to each centroid of
    * a plan-constant codebook — the IVF assignment/probe kernel as one
    * fused narrow pass (`array<double>` of length `centroids.length`).
    */
  def centroidDists(v: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(CentroidDists(ColumnBridge.expression(v), centroids))
}

/** Sequential-fold `array<double>` dot product (whole-stage codegen'd). */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

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
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Multi-table sign-LSH sketch of an `array<double>` vector against a
  * plan-constant hyperplane matrix: output `array<bigint>` of length
  * `tables`; bit i of element t is the sign of the dot with plane
  * `t * bits + i`. The matrix rides along as a codegen reference object —
  * a primitive `double[][]`, shared by every row of the partition.
  */
case class SignSketch(child: Expression, planes: Seq[Seq[Double]], tables: Int, bits: Int)
    extends UnaryExpression {

  require(planes.length == tables * bits, s"need ${tables * bits} planes, got ${planes.length}")
  require(bits <= 63, "bits must fit a signed long")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sign_sketch"

  @transient private lazy val mat: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = 0L
      var b = 0
      while (b < bits) {
        val p = mat(t * bits + b)
        val n = math.min(v.numElements(), p.length)
        var dot = 0.0
        var j = 0
        while (j < n) { dot += v.getDouble(j) * p(j); j += 1 }
        if (dot > 0) acc |= (1L << b)
        b += 1
      }
      out(t) = acc
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("planes", mat, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val dot = ctx.freshName("dot")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      s"""
         |final long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $acc = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    final double[] $p = $matRef[$t * $bits + $b];
         |    final int $n = Math.min($v.numElements(), $p.length);
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $dot += $v.getDouble($j) * $p[$j];
         |    }
         |    if ($dot > 0) $acc |= (1L << $b);
         |  }
         |  $out[$t] = $acc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Squared-L2 distances from an `array<double>` vector to every row of a
  * plan-constant centroid codebook (`array<double>` out, same fold order
  * as `aggregate(zip_with(v, c, (x,y) => (x-y)*(x-y)), 0.0, _+_)`).
  */
case class CentroidDists(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_centroid_dists"

  @transient private lazy val mat: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Double](mat.length)
    var c = 0
    while (c < mat.length) {
      val cent = mat(c)
      val n = math.min(v.numElements(), cent.length)
      var d = 0.0
      var j = 0
      while (j < n) { val t = v.getDouble(j) - cent(j); d += t * t; j += 1 }
      out(c) = d
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centroids", mat, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val cent = ctx.freshName("cent")
      val n = ctx.freshName("n")
      s"""
         |final double[] $out = new double[${mat.length}];
         |for (int $c = 0; $c < ${mat.length}; $c++) {
         |  final double[] $cent = $matRef[$c];
         |  final int $n = Math.min($v.numElements(), $cent.length);
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    final double $t = $v.getDouble($j) - $cent[$j];
         |    $d += $t * $t;
         |  }
         |  $out[$c] = $d;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
