package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType,
  LongType, StructField, StructType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The composable alternative (`zip_with` + `aggregate` higher-order
  * functions) allocates a lambda frame per element and cannot be fused by
  * whole-stage codegen; on an all-pairs similarity join that interpretive
  * overhead dominates end-to-end runtime. These expressions generate a
  * tight primitive loop instead (and keep the same strict left-to-right
  * summation order, so results remain bit-identical to the fold-based
  * formulation and to external oracles using a sequential reduce).
  *
  * Inputs must already be `array<double>` — cast upstream (float->double
  * widening is exact). A length mismatch yields NULL, matching the
  * `zip_with` fold these replace (zip_with pads the shorter side with
  * nulls, so the fold's sum goes null) — a malformed row surfaces as null
  * rather than a silently truncated score.
  */
case class DotProductD(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product_d"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    if (x.length != y.length) return null
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("xs")
      val y = ctx.freshName("ys")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
        double[] $x = $a.toDoubleArray();
        double[] $y = $b.toDoubleArray();
        if ($x.length != $y.length) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          for (int $i = 0; $i < $x.length; $i++) { $s += $x[$i] * $y[$i]; }
          ${ev.value} = $s;
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Integer dot product over two `array<long>` columns (the int8/Q4
  * quantized-code hot path). Long addition is associative modulo 2^64, so
  * this is bit-identical to the `aggregate(zip_with(_*_), 0L, _+_)` fold
  * it replaces — but codegen'd: the HOF form allocates a lambda frame per
  * element and ran 4x SLOWER than the float scan it was supposed to beat
  * (round-5 verdict). The compressed index only pays off if scanning
  * codes is cheaper than scanning floats; this loop makes it so.
  */
case class DotProductL(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product_l"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    if (x.length != y.length) return null
    var s = 0L
    var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("xs")
      val y = ctx.freshName("ys")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
        long[] $x = $a.toLongArray();
        long[] $y = $b.toLongArray();
        if ($x.length != $y.length) {
          ${ev.isNull} = true;
        } else {
          long $s = 0L;
          for (int $i = 0; $i < $x.length; $i++) { $s += $x[$i] * $y[$i]; }
          ${ev.value} = $s;
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Quantized squared L2 distance `floor(sum((x_i - y_i)^2) * 10^6)` over
  * two `array<double>` columns — the PQ encode/ADC-distance-table inner
  * loop. Strict left-to-right summation and a single `Math.floor` at the
  * end keep it bit-identical to the
  * `floor(aggregate(zip_with((x-y)*(x-y)), 0.0, _+_) * 1e6)` fold it
  * replaces (and to a sequential-fold DuckDB oracle). The fold form is
  * interpreted per element and made `sim_topk_pq` GC-bound (clean-session
  * swings of 2.7-12s, round-5 verdict).
  */
case class SquaredL2Q6(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "squared_l2_q6"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    if (x.length != y.length) return null
    var s = 0.0
    var i = 0
    while (i < x.length) { val d = x(i) - y(i); s += d * d; i += 1 }
    math.floor(s * 1000000.0).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("xs")
      val y = ctx.freshName("ys")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
        double[] $x = $a.toDoubleArray();
        double[] $y = $b.toDoubleArray();
        if ($x.length != $y.length) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          for (int $i = 0; $i < $x.length; $i++) {
            double $d = $x[$i] - $y[$i];
            $s += $d * $d;
          }
          ${ev.value} = (long) java.lang.Math.floor($s * 1.0E6);
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static kernels callable from generated code (plain object with no
  * companion class, so scalac emits static forwarders — `VectorKernels
  * .quantizeD(xs)` compiles as a static call in generated Java).
  */
object VectorKernels {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** max-abs scale + `floor(x/scale*127)` codes; scale==0 -> all-zero
    * codes (matches the fold form's `when(scale === 0.0, 0L)` guard).
    */
  def quantizeD(xs: Array[Double]): InternalRow = {
    var scale = 0.0
    var i = 0
    while (i < xs.length) { val v = math.abs(xs(i)); if (v > scale) scale = v; i += 1 }
    val q = new Array[Long](xs.length)
    if (scale != 0.0) {
      i = 0
      while (i < xs.length) { q(i) = math.floor(xs(i) / scale * 127.0).toLong; i += 1 }
    }
    new GenericInternalRow(Array[Any](scale, new GenericArrayData(q)))
  }

  def quantizeF(fs: Array[Float]): InternalRow = {
    val xs = new Array[Double](fs.length)
    var i = 0
    while (i < fs.length) { xs(i) = fs(i).toDouble; i += 1 }
    quantizeD(xs)
  }
}

/** Int8 quantization `(scale: max-abs, q_i: floor(x_i / scale * 127))` in
  * ONE native pass. The composable form inlines the `array_max(...)`
  * scale sub-expression INSIDE the per-element lambda after optimization,
  * so the interpreted cost is O(dim^2) PER ROW (~4k lambda frames for a
  * 64-dim vector — this was most of `sim_topk_int8`'s overhead, not the
  * per-pair dot product). Accepts `array<float>` or `array<double>`;
  * float->double widening is exact, results bit-identical to the fold
  * form for non-empty arrays.
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "quantize_int8"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_int8 needs array<float|double>, got ${other.sql}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    if (isFloat) VectorKernels.quantizeF(ad.toFloatArray())
    else VectorKernels.quantizeD(ad.toDoubleArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val call =
        if (isFloat) s"graft.expressions.VectorKernels.quantizeF($a.toFloatArray())"
        else s"graft.expressions.VectorKernels.quantizeD($a.toDoubleArray())"
      s"${ev.value} = $call;"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ADC sums for ALL queries at once: `codes` holds a vector's m DENSE
  * codebook ranks (values in [0, k)); `dtabs` is EVERY query's flattened
  * m x k distance table concatenated in qid order (Q*m*k longs, from a
  * 1-row broadcast). Returns the Q-long array
  * `out[q] = sum_j dtabs[q*m*k + j*k + codes[j]]` — the classic FAISS
  * ADC table-lookup loop, batched over the query set.
  *
  * Why this shape: evaluating per (query, vector) PAIR forces the join
  * to fabricate a wide row carrying the m*k table per pair (measured:
  * slower than the (j, code)-join it replaced); evaluating per VECTOR
  * against a single broadcast row does the identical Q*m integer adds
  * with zero per-pair row fabrication — the pair rows only exist as the
  * narrow posexplode output. Element access only (`getLong`), no array
  * materialization. Long addition is exact and order-free, so sums are
  * bit-identical to the grouped-sum formulation.
  */
case class AdcSumsAll(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "adc_sums_all"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val dtabs = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val q = if (m == 0) 0 else dtabs.numElements() / (m * k)
    val out = new Array[Long](q)
    var qi = 0
    while (qi < q) {
      val base = qi * m * k
      var s = 0L
      var j = 0
      while (j < m) { s += dtabs.getLong(base + j * k + codes.getLong(j).toInt); j += 1 }
      out(qi) = s
      qi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      val base = ctx.freshName("base")
      val s = ctx.freshName("s")
      val qi = ctx.freshName("qi")
      val j = ctx.freshName("j")
      s"""
        int $m = $a.numElements();
        int $q = ($m == 0) ? 0 : $b.numElements() / ($m * $k);
        long[] $out = new long[$q];
        for (int $qi = 0; $qi < $q; $qi++) {
          int $base = $qi * $m * $k;
          long $s = 0L;
          for (int $j = 0; $j < $m; $j++) {
            $s += $b.getLong($base + $j * $k + (int) $a.getLong($j));
          }
          $out[$qi] = $s;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** PQ codebook arg-min for one subvector: `sv` is a vector's subspace-`j`
  * slice (sub doubles), `cents` is the WHOLE codebook flattened in
  * (subspace-major, rank-minor, dim-minor) order (m*k*sub doubles, from a
  * 1-row broadcast), `j` selects the subspace. Scans the k candidates in
  * rank (= centroid-id ascending) order computing the quantized squared
  * L2 (`floor(sum((x-y)^2) * 1e6)`, strict left-to-right fold — the
  * SquaredL2Q6 convention), keeping the first strict minimum, which
  * reproduces `min(struct(d_q6, cid))` tie-breaking exactly. Returns
  * struct(code: rank, d_q6).
  *
  * Why: the join formulation (explode x broadcast-join x
  * `min(struct(...))`) plans a SortAggregate over corpus x m x k rows —
  * struct mins cannot hash-aggregate, so the 10x smoke sorted 16M rows
  * twice just to arg-min them. This computes the identical result in one
  * narrow pass with zero post-scan shuffle.
  */
case class PqArgMin(first: Expression, second: Expression, third: Expression, k: Int)
    extends TernaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("code", LongType, nullable = false),
    StructField("d_q6", LongType, nullable = false)))
  override def prettyName: String = "pq_arg_min"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val sv = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val j = c.asInstanceOf[Long].toInt
    val sub = sv.numElements()
    var bestD = Long.MaxValue
    var bestR = 0L
    var r = 0
    while (r < k) {
      val base = (j * k + r) * sub
      var acc = 0.0
      var i = 0
      while (i < sub) {
        val d = sv.getDouble(i) - cents.getDouble(base + i)
        acc += d * d
        i += 1
      }
      val dq = math.floor(acc * 1000000.0).toLong
      if (dq < bestD) { bestD = dq; bestR = r.toLong }
      r += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestR, bestD))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val sub = ctx.freshName("sub")
      val bestD = ctx.freshName("bestD")
      val bestR = ctx.freshName("bestR")
      val r = ctx.freshName("r")
      val base = ctx.freshName("base")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val dq = ctx.freshName("dq")
      s"""
        int $sub = $a.numElements();
        long $bestD = Long.MAX_VALUE;
        long $bestR = 0L;
        for (int $r = 0; $r < $k; $r++) {
          int $base = ((int) $c * $k + $r) * $sub;
          double $acc = 0.0;
          for (int $i = 0; $i < $sub; $i++) {
            double $d = $a.getDouble($i) - $b.getDouble($base + $i);
            $acc += $d * $d;
          }
          long $dq = (long) java.lang.Math.floor($acc * 1.0E6);
          if ($dq < $bestD) { $bestD = $dq; $bestR = (long) $r; }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[]{ $bestR, $bestD });
      """
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** L2 norm with the same sequential summation order as the fold form. */
case class L2NormD(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm_d"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val x = ctx.freshName("xs")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
        double[] $x = $a.toDoubleArray();
        double $s = 0.0;
        for (int $i = 0; $i < $x.length; $i++) { $s += $x[$i] * $x[$i]; }
        ${ev.value} = java.lang.Math.sqrt($s);
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Column wrappers (classic-mode Column <-> Expression bridge). */
  def dotProduct(a: Column, b: Column): Column =
    column(DotProductD(expression(a), expression(b)))
  def dotProductL(a: Column, b: Column): Column =
    column(DotProductL(expression(a), expression(b)))
  def squaredL2Q6(a: Column, b: Column): Column =
    column(SquaredL2Q6(expression(a), expression(b)))
  def quantizeInt8(a: Column): Column = column(QuantizeInt8(expression(a)))
  def adcSumsAll(codes: Column, dtabs: Column, k: Int): Column =
    column(AdcSumsAll(expression(codes), expression(dtabs), k))
  def pqArgMin(sv: Column, cents: Column, j: Column, k: Int): Column =
    column(PqArgMin(expression(sv), expression(cents), expression(j), k))
  def l2Norm(a: Column): Column = column(L2NormD(expression(a)))
}
