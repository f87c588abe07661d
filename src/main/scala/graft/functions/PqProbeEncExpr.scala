package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the IVFADC probe-side kernel of the
  * semantic family (SimOps.semanticProbeFrame): per arrival vector, the
  * nprobe nearest coarse cells and, per probed cell, the residual's
  * per-subspace PQ codes and ADC lookup tables — one tight Java pass.
  *
  * The expression-chain twin it replaces (CentroidDists → interpreted
  * `zip_with`/`array_sort`/`transform` probe ranking → interpreted
  * `zip_with` residual → subspaces separate CentroidDists columns →
  * `array_position(array_min)` argmin scans → an array-of-arrays
  * assembly projection) is semantically exact but pays per-row
  * higher-order-function interpretation and materializes every
  * intermediate column; thread-sampling the live gate showed ~1 ms of
  * CPU per (arrival × probe) row in that projection — the dominant cost
  * of every consumer of the frame. Here the whole kernel is
  * subspaces · kSub · subdim fused multiply-adds plus one bounded
  * probe-selection sort, with the argmin folded into the same pass that
  * fills each table (guide: eliminate non-codegen expressions from the
  * hot path). Asserted bit-identical to the expression chain on the
  * real corpus in PqProbeEncExprSpec — every fold runs in the same
  * element order, so not even a 1-ulp drift is possible.
  */
object PqProbeEncExpr {

  /** `pqProbeEnc(v)`: array<struct<pos:int, cell:int, codes:array<int>,
    * tbls:array<array<double>>>> — one element per probed cell, in
    * ascending (distance, cell) order; `pos` 0 = the assignment cell,
    * `cell` is 1-based (list_position), `codes` are the 1-based argmin
    * codes of the residual vs `cell`, `tbls` the kSub-wide per-subspace
    * squared-distance tables of that residual.
    */
  def pqProbeEnc(v: Column, coarse: Seq[Seq[Double]],
      books: Seq[Seq[Seq[Double]]], nprobe: Int,
      residual: Boolean = true): Column =
    ColumnBridge.column(
      PqProbeEnc(ColumnBridge.expression(v), coarse, books, nprobe, residual))
}

/** JVM implementation shared by interpreted eval and generated code
  * (the AdcTopCImpl pattern: codegen emits one static call per row).
  */
object PqProbeEncImpl {

  def probes(v: ArrayData, coarse: Array[Array[Double]],
      books: Array[Array[Array[Double]]], nprobe: Int,
      residual: Boolean): ArrayData = {
    val nC = coarse.length
    // coarse distances — the CentroidDists fold verbatim (same j order)
    val cd = new Array[Double](nC)
    var c = 0
    while (c < nC) {
      val cent = coarse(c)
      val n = math.min(v.numElements(), cent.length)
      var d = 0.0
      var j = 0
      while (j < n) { val t = v.getDouble(j) - cent(j); d += t * t; j += 1 }
      cd(c) = d
      c += 1
    }
    // probe order: ascending (distance, cell index) — the array_sort of
    // struct(d, i) the chain twin used (distances are finite ≥ +0.0, so
    // Double.compare matches the SQL double ordering here)
    val order = Array.range(0, nC).map(Integer.valueOf)
    java.util.Arrays.sort(order, new java.util.Comparator[Integer] {
      override def compare(x: Integer, y: Integer): Int = {
        val cmp = java.lang.Double.compare(cd(x), cd(y))
        if (cmp != 0) cmp else Integer.compare(x, y)
      }
    })
    val p = math.min(nprobe, nC)
    val m = books.length
    val out = new Array[Any](p)
    var pi = 0
    while (pi < p) {
      val cellIdx = order(pi).intValue()
      val cent = coarse(cellIdx)
      // residual — the zip_with(v, coarse(cell), a - b) subtraction;
      // the non-residual family (raw PQ) codes the vector itself
      val dim = math.min(v.numElements(), cent.length)
      val enc = new Array[Double](dim)
      var j = 0
      if (residual)
        while (j < dim) { enc(j) = v.getDouble(j) - cent(j); j += 1 }
      else
        while (j < dim) { enc(j) = v.getDouble(j); j += 1 }
      val sub = dim / m
      val codes = new Array[Int](m)
      val tbls = new Array[Any](m)
      var mm = 0
      while (mm < m) {
        val book = books(mm)
        val kSub = book.length
        val sd = new Array[Double](kSub)
        val off = mm * sub
        // argmin folded into the table fill: strict < keeps the FIRST
        // minimum, exactly array_position(sd, array_min(sd))
        var minV = Double.PositiveInfinity
        var minI = 0
        var cc = 0
        while (cc < kSub) {
          val cw = book(cc)
          val nn = math.min(sub, cw.length)
          var d = 0.0
          var jj = 0
          while (jj < nn) { val t = enc(off + jj) - cw(jj); d += t * t; jj += 1 }
          sd(cc) = d
          if (d < minV) { minV = d; minI = cc }
          cc += 1
        }
        codes(mm) = minI + 1
        tbls(mm) = UnsafeArrayData.fromPrimitiveArray(sd)
        mm += 1
      }
      out(pi) = new GenericInternalRow(Array[Any](pi, cellIdx + 1,
        UnsafeArrayData.fromPrimitiveArray(codes), new GenericArrayData(tbls)))
      pi += 1
    }
    new GenericArrayData(out)
  }
}

/** See [[PqProbeEncExpr.pqProbeEnc]]. The model is stored as Seq (value
  * equality) so two identical expressions compare equal — Array params
  * would break Catalyst canonicalization/semanticEquals and
  * common-subexpression dedup (the CentroidDists pattern); the primitive
  * arrays the kernel runs over are rebuilt per JVM in @transient lazy
  * vals.
  */
case class PqProbeEnc(child: Expression, coarse: Seq[Seq[Double]],
    books: Seq[Seq[Seq[Double]]], nprobe: Int, residual: Boolean)
    extends UnaryExpression {

  require(nprobe > 0, "nprobe must be positive")
  require(coarse.nonEmpty && books.nonEmpty, "empty PQ model")

  @transient private lazy val coarseArr: Array[Array[Double]] =
    coarse.map(_.toArray).toArray
  @transient private lazy val booksArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("cell", IntegerType, nullable = false),
      StructField("codes", ArrayType(IntegerType, containsNull = false),
        nullable = false),
      StructField("tbls",
        ArrayType(ArrayType(DoubleType, containsNull = false),
          containsNull = false), nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_pq_probe_enc"

  override def nullSafeEval(v: Any): Any =
    PqProbeEncImpl.probes(
      v.asInstanceOf[ArrayData], coarseArr, booksArr, nprobe, residual)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coarseRef = ctx.addReferenceObj("coarse", coarseArr, "double[][]")
    val booksRef = ctx.addReferenceObj("books", booksArr, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqProbeEncImpl.probes(" +
        s"$v, $coarseRef, $booksRef, $nprobe, $residual);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
