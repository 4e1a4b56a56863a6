package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two `array<float>` columns.
  *
  * The similarity-search and embedding-near-dup operators need a dot
  * product in the innermost loop of an O(n·m) candidate scan. The
  * built-in route (`aggregate(zip_with(a, b, _ * _), ...)`) allocates an
  * intermediate array per row and is evaluated without whole-stage
  * codegen; this expression instead generates a tight primitive loop
  * (accumulating in double for precision) so the pair scan stays inside
  * WholeStageCodegen. Falls back to an interpreted loop under
  * `nullSafeEval` for non-codegen paths.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<float> arguments, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Dot products of one `array<float>` column against a CONSTANT matrix
  * (centroids, PQ codebook slices, hyperplanes), each divided by a
  * scalar column: `out[j] = dot(vec, matrix[j]) / div`.
  *
  * Why this exists: the composed form — `array(vec_dot(v, lit(m_0))/n,
  * …, vec_dot(v, lit(m_k))/n)` — unrolls k independent dot loops into
  * the fused whole-stage-codegen method. At IVF/PQ sizes (16 centroids
  * × 64 dims, or 4×16 codebook slices) the generated `processNext`
  * exceeds HotSpot's 8000-byte JIT ceiling (`DontCompileHugeMethods`),
  * so the hot stage silently runs in the BYTECODE INTERPRETER —
  * measured as ann_ivf_topk spending 0.86 s of 1.4 s in one 2000-row
  * map stage. This expression emits ONE tiny nested loop over a
  * `float[][]` reference object instead: JIT-compiled, k× less code,
  * same arithmetic.
  *
  * Bit-compatibility contract (the DuckDB oracles replay it): the
  * inner accumulation is the exact [[FloatVecDot]] loop — ascending i,
  * `(double) v[i] * (double) m[j][i]` — and each row's result is
  * divided by `div` exactly as the composed `Divide` did.
  *
  * The matrix is a constructor param (not a child): it is always a
  * driver-side constant here, and a `Seq` param keeps case-class
  * equality structural so plan canonicalization still works.
  */
case class FloatVecMatDots(
    vec: Expression,
    matrix: IndexedSeq[IndexedSeq[Float]],
    div: Expression) extends BinaryExpression {
  require(matrix.nonEmpty, "vec_mat_dots needs a non-empty matrix")

  override def left: Expression = vec
  override def right: Expression = div

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (vec.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }) && div.dataType == DoubleType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_mat_dots requires (array<float>, double), " +
          s"got ${vec.dataType.catalogString} and ${div.dataType.catalogString}")
  }

  @transient private lazy val mat: Array[Array[Float]] =
    matrix.map(_.toArray).toArray

  override def nullSafeEval(v: Any, d: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val dv = d.asInstanceOf[Double]
    val out = new Array[Double](mat.length)
    var j = 0
    while (j < mat.length) {
      val row = mat(j)
      val n = math.min(x.numElements(), row.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getFloat(i).toDouble * row(i).toDouble; i += 1 }
      out(j) = acc / dv
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, d) => {
      val matRef = ctx.addReferenceObj("mat", mat, "float[][]")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      s"""
         |double[] $out = new double[${mat.length}];
         |for (int $j = 0; $j < ${mat.length}; $j++) {
         |  float[] $row = $matRef[$j];
         |  int $n = java.lang.Math.min($v.numElements(), $row.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $v.getFloat($i) * (double) $row[$i];
         |  }
         |  $out[$j] = $acc / $d;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(vec = newLeft, div = newRight)
}

/** 64-bit polynomial rolling hash over a string's UTF-8 bytes:
  * h = Σ base^(n-1-i) · byte(i)  (mod 2^64).
  *
  * The content-fingerprinting primitive for dedup pipelines — unlike
  * md5 it is cheap (one multiply-add per byte, no allocation) and
  * composable (the polynomial form supports chunk-wise combination for
  * document shingling). Codegen'd; interpreted fallback mirrors the
  * same arithmetic exactly.
  */
case class RollingHash(child: Expression, base: Long = 1315423911L)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_hash requires a string argument, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * base + (bytes(i) & 0xff); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * ${base}L + ($bytes[$i] & 0xff);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Avalanche finalizer for [[RollingHash]]: the top 32 bits of
  * `h · 0x9E3779B97F4A7C15 (mod 2^64)`.
  *
  * A polynomial fold is distinct-preserving but NOT uniform in its high
  * bits — strings differing only in trailing bytes produce folds that
  * differ by a small delta, so `fold >>> 32` collapses them onto one
  * value. One wrapping multiply by the odd golden-ratio constant
  * propagates low-bit deltas across the whole word (δ → δ·C mod 2^64),
  * making the top half usable as a uniform 32-bit draw — what
  * order-statistic sketches (KMV) require.
  *
  * Raw Java long arithmetic (wrapping, ANSI-exempt) in both codegen and
  * the interpreted fallback; the DuckDB replay decomposes the multiply
  * into 32-bit limbs to stay inside HUGEINT (`OracleSql.kmvDistinct`).
  */
case class MixHash32(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mix_hash32 requires a bigint argument, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    (v.asInstanceOf[Long] * MixHash32.C) >>> 32

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = ($h * ${MixHash32.C}L) >>> 32;")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MixHash32 {
  /** 0x9E3779B97F4A7C15 (2^64/φ, odd) as a signed long. */
  val C: Long = -7046029254386353131L
}

/** Distinct word n-grams of a token array, fused and codegen'd.
  *
  * Replaces the declarative
  * `array_distinct(transform(sequence(0, size-n), i => concat_ws(...)))`
  * pipeline in the dedup operators: higher-order functions execute
  * OUTSIDE whole-stage codegen and interpret their lambda per element
  * (per round-1 profiling, the dominant cost of n-gram generation), and
  * `array_distinct` then makes a second pass. This expression builds
  * the distinct gram set in one tight loop — n-gram generation is the
  * shared front of the top bench hotspots (`dedup_ngram_*`,
  * `dedup_clusters`, `dedup_minhash_lsh`, `decontaminate_ngram`).
  *
  * Output order is first-occurrence (same as `array_distinct`); every
  * consumer explodes into joins/aggregations, so order never reaches a
  * result. Tokens shorter than `n` produce an empty array, matching
  * the `when(size >= n, ...)` guard it replaces.
  */
case class WordNGrams(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, "n must be >= 1")

  private val elemType = org.apache.spark.sql.types.StringType

  override def dataType: DataType = ArrayType(elemType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(t, _) if t == elemType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngrams requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sz = arr.numElements()
    val set = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    if (sz >= n) {
      val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
      var i = 0
      while (i <= sz - n) {
        val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        set.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      set.toArray(new Array[AnyRef](set.size())))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      val sep = ctx.addReferenceObj("sep",
        org.apache.spark.unsafe.types.UTF8String.fromString(" "), utf8)
      val sz = ctx.freshName("sz")
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val parts = ctx.freshName("parts")
      s"""
         |int $sz = $arr.numElements();
         |java.util.LinkedHashSet $set = new java.util.LinkedHashSet();
         |if ($sz >= $n) {
         |  for (int $i = 0; $i <= $sz - $n; $i++) {
         |    $utf8[] $parts = new $utf8[$n];
         |    for (int $j = 0; $j < $n; $j++) {
         |      $parts[$j] = $arr.getUTF8String($i + $j);
         |    }
         |    $set.add($utf8.concatWs($sep, $parts));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($set.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
