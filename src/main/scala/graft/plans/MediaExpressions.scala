package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit average-hash (aHash) over a binary payload — the perceptual
  * fingerprint primitive of the multimodal family.
  *
  * The payload is cut into 64 equal spans (span b covers bytes
  * `[⌊b·n/64⌋, ⌊(b+1)·n/64⌋)`); bit b is set iff span b's mean byte
  * value is at or above the payload's global mean. Means are compared
  * by exact integer cross-multiplication (`spanSum·n ≥ totalSum·len`)
  * — no float division, so the hash is bit-identical on every engine
  * (the DuckDB oracle replays the same arithmetic). A span that gets
  * no bytes (payload shorter than 64) leaves its bit 0.
  *
  * This is the classic aHash shape (block means against the global
  * mean) applied to the decoded byte plane; with a real decoder the
  * input is the 8×8-downsampled luma plane, here it is the payload the
  * [[graft.operators.Multimodal.StubDecoder]] pipeline produces. Two
  * perceptually-near payloads differ in few bits, so near-dup pairing
  * is a Hamming ball over these hashes — see
  * [[graft.operators.Multimodal.ahashPairs]] for the banded join that
  * finds those pairs without a cross join.
  *
  * Exact-integer bound: `spanSum·n < 255·n² < 2^63` holds for any
  * payload under ~190 MB — far beyond a decoded media plane; the
  * expression is total within that envelope.
  */
case class AHash64(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ahash64 requires a binary argument, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    AHash64.hash(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.plans.AHash64.hash($b);")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = newChild)
}

/** Per-block energy of a binary payload: the payload is cut into
  * fixed-size `blockSize`-byte blocks (last block ragged) and each
  * block reports `Σ (byte − center)²` — the squared deviation from the
  * DC offset, i.e. the PCM energy measure that drives silence/voice
  * detection, in exact integer arithmetic (engine-replayable). One
  * codegen pass; the array output feeds a relational gaps-and-islands
  * segmentation downstream ([[graft.operators.Multimodal.silenceSegments]]).
  *
  * Exact-integer bound: per-byte deviation² ≤ 255², so a block sum
  * stays below 2^63 for any blockSize under ~1.4·10¹⁴ bytes.
  */
case class ByteBlockEnergy(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    blockSize: Int,
    center: Int)
    extends UnaryExpression {
  require(blockSize >= 1, "blockSize must be >= 1")
  require(center >= 0 && center <= 255, "center must be a byte value")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType,
      containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"byte_block_energy requires a binary argument, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    ByteBlockEnergy.energies(v.asInstanceOf[Array[Byte]], blockSize, center)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.plans.ByteBlockEnergy.energies($b, $blockSize, $center);")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = newChild)
}

object ByteBlockEnergy {
  /** Static JVM implementation shared by interpreted eval and codegen. */
  def energies(bytes: Array[Byte], blockSize: Int, center: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = bytes.length
    val nBlocks = (n + blockSize - 1) / blockSize
    val out = new Array[Long](nBlocks)
    var b = 0
    while (b < nBlocks) {
      val hi = math.min((b + 1) * blockSize, n)
      var s = 0L
      var i = b * blockSize
      while (i < hi) {
        val d = (bytes(i) & 0xff) - center
        s += d.toLong * d
        i += 1
      }
      out(b) = s
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object AHash64 {
  /** Static JVM implementation shared by interpreted eval and codegen. */
  def hash(bytes: Array[Byte]): Long = {
    val n = bytes.length.toLong
    if (n == 0L) return 0L
    var total = 0L
    var i = 0
    while (i < bytes.length) { total += bytes(i) & 0xff; i += 1 }
    var h = 0L
    var b = 0
    while (b < 64) {
      val lo = (b * n / 64).toInt
      val hi = ((b + 1) * n / 64).toInt
      if (hi > lo) {
        var s = 0L
        var j = lo
        while (j < hi) { s += bytes(j) & 0xff; j += 1 }
        if (s * n >= total * (hi - lo)) h |= 1L << b
      }
      b += 1
    }
    h
  }
}
