package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the bounded semantic gate's hot inner
  * loop (SimOps.semanticTopcCandidates): ADC-score every posting of one
  * probed cell against the arrival's per-subspace lookup tables and
  * keep the (adc asc, b_id asc) top-c — one tight Java pass with a
  * bounded selection heap.
  *
  * The HOF twin (`transform` + per-element `aggregate` fold +
  * `array_sort` + `slice`) is semantically exact but interpreted
  * per POSTING ELEMENT: at sf10 the ~31M posting evaluations made the
  * bounded gate SLOWER than the unbounded one it exists to beat
  * (59 s vs 51 s — BASELINE.md round 17). Here the per-row cost is
  * |postings| · subspaces array reads plus an O(|postings| · log c)
  * bounded max-heap — no full sort, no per-element closure machinery.
  * Asserted bit-identical to the HOF twin in AdcTopCExprSpec (real
  * corpus + property cases), and the round-6-before-rank discipline is
  * preserved (java.math HALF_UP, the same rounding `round(x, 6)`
  * lowers to), so the DuckDB oracle replay is untouched.
  */
object AdcTopCExpr {

  /** `adcTopC(cands, tbls, c)`: the (adc, b_id) top-c of one posting
    * array. `cands` is array<struct<b_id: long, codes: array<int>>>
    * (1-based codes, matching list_position); `tbls` is
    * array<array<double>> — one kSub-wide lookup table per subspace.
    * Null `cands` (an outer-join miss) yields null, keeping
    * zero-candidate arrivals alive through explode_outer.
    */
  def adcTopC(cands: Column, tbls: Column, topc: Int): Column =
    ColumnBridge.column(AdcTopC(
      ColumnBridge.expression(cands), ColumnBridge.expression(tbls), topc))
}

/** JVM implementation shared by interpreted eval and generated code
  * (the BpeMergeImpl pattern: codegen emits one static call per row).
  */
object AdcTopCImpl {

  /** Strict (a1, i1) > (a2, i2) in the (adc asc, b_id asc) rank order —
    * the heap keeps the c SMALLEST, so the root is the worst kept.
    */
  private def after(a1: Double, i1: Long, a2: Double, i2: Long): Boolean =
    a1 > a2 || (a1 == a2 && i1 > i2)

  def topC(cands: ArrayData, tbls: ArrayData, c: Int): ArrayData = {
    val m = tbls.numElements()
    val tb = new Array[Array[Double]](m)
    var i = 0
    while (i < m) { tb(i) = tbls.getArray(i).toDoubleArray(); i += 1 }
    val n = cands.numElements()
    val k = math.min(c, n)
    // bounded max-heap over (adc, id): root = worst of the kept c
    val hA = new Array[Double](math.max(k, 1))
    val hI = new Array[Long](math.max(k, 1))
    var hn = 0
    var j = 0
    while (j < n) {
      val row = cands.getStruct(j, 2)
      val id = row.getLong(0)
      val codes = row.getArray(1)
      var a = 0.0
      var mm = 0
      while (mm < m) { a += tb(mm)(codes.getInt(mm) - 1); mm += 1 }
      // round-6 BEFORE the rank (the adcTopK discipline) — HALF_UP,
      // exactly what round(x, 6) lowers to
      a = java.math.BigDecimal.valueOf(a)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if (hn < k) {
        // sift up
        var p = hn; hA(p) = a; hI(p) = id; hn += 1
        while (p > 0 && after(hA(p), hI(p), hA((p - 1) / 2), hI((p - 1) / 2))) {
          val q = (p - 1) / 2
          val ta = hA(p); val ti = hI(p)
          hA(p) = hA(q); hI(p) = hI(q); hA(q) = ta; hI(q) = ti
          p = q
        }
      } else if (k > 0 && after(hA(0), hI(0), a, id)) {
        // replace root, sift down
        hA(0) = a; hI(0) = id
        var p = 0
        var done = false
        while (!done) {
          val l = 2 * p + 1; val r = l + 1
          var w = p
          if (l < hn && after(hA(l), hI(l), hA(w), hI(w))) w = l
          if (r < hn && after(hA(r), hI(r), hA(w), hI(w))) w = r
          if (w == p) done = true
          else {
            val ta = hA(p); val ti = hI(p)
            hA(p) = hA(w); hI(p) = hI(w); hA(w) = ta; hI(w) = ti
            p = w
          }
        }
      }
      j += 1
    }
    // emit ascending by (adc, b_id) — the order array_sort produced, so
    // the HOF bit-identity spec can compare arrays directly
    val idx = Array.range(0, hn).map(Integer.valueOf)
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(x: Integer, y: Integer): Int = {
        val cmp = java.lang.Double.compare(hA(x), hA(y))
        if (cmp != 0) cmp else java.lang.Long.compare(hI(x), hI(y))
      }
    })
    val out = new Array[Any](hn)
    var o = 0
    while (o < hn) {
      out(o) = new GenericInternalRow(
        Array[Any](hA(idx(o).intValue()), hI(idx(o).intValue())))
      o += 1
    }
    new GenericArrayData(out)
  }
}

/** See [[AdcTopCExpr.adcTopC]]. */
case class AdcTopC(left: Expression, right: Expression, topc: Int)
    extends BinaryExpression {

  require(topc > 0, "topc must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("adc", DoubleType, nullable = false),
      StructField("b_id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_adc_topc"

  override def nullSafeEval(cands: Any, tbls: Any): Any =
    AdcTopCImpl.topC(
      cands.asInstanceOf[ArrayData], tbls.asInstanceOf[ArrayData], topc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cands, tbls) =>
      s"${ev.value} = graft.functions.AdcTopCImpl.topC($cands, $tbls, $topc);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
