package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** The banded-LSH plane matrix as a JVM constant — the same md5
  * derivation as `Similarity.planeComponent` (FunctionsSpec pins the
  * two bit-identical), hoisted here so the native signature expression
  * below and the operators package can share it without a dependency
  * cycle. */
object LshPlanes {
  val Bands = 10
  val Rows = 4
  val Dims = 64
  /** matrix(p)(i) = hyperplane p's component for dimension i. */
  lazy val matrix: Array[Array[Double]] =
    Array.tabulate(Bands * Rows, Dims) { (p, i) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"plane,$p,$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 1000000L).toDouble / 1000000.0 - 0.5
    }
}

/** Native LSH band signatures over one `array<double>` embedding: the
  * fused-loop twin of the declarative `zip_with`+`aggregate` form in
  * `Similarity.lshBandSignatures` (kept as the portable reference;
  * SimilaritySpec asserts the two identical row-for-row). The
  * declarative form evaluates 40 interpreted lambda folds — 2×64
  * lambda invocations per plane per VECTOR (probed at 388 ms of task
  * CPU for the sf0.1 corpus, all in one scan task); this loop does the
  * same 2 560 multiply-adds per vector in straight JVM code.
  *
  * Arithmetic is the identical left-to-right fold per plane, so the
  * projections — and even the SIGN of a near-zero projection — are
  * bit-for-bit the declarative form's, and the DuckDB oracle replays
  * unchanged. Null semantics mirror the declarative form too, which is
  * NOT the usual null-intolerant expression contract: a NULL vector, a
  * wrong-length vector, or any NULL element poisons every projection
  * to NULL there, and `when(proj > 0, 1).otherwise(0)` then reads
  * every bit as 0 — so this expression returns the all-zero band array
  * in those cases, never NULL. */
case class LshSigs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_sigs expects array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_lsh_sigs"

  private def elemsMayBeNull: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def eval(input: InternalRow): Any = {
    import LshPlanes._
    val bands = new Array[Int](Bands)
    val a = child.eval(input)
    if (a != null) {
      val v = a.asInstanceOf[ArrayData]
      var ok = v.numElements() == Dims
      if (ok && elemsMayBeNull) {
        var i = 0
        while (ok && i < Dims) { ok = !v.isNullAt(i); i += 1 }
      }
      if (ok) {
        val x = new Array[Double](Dims)
        var i = 0
        while (i < Dims) { x(i) = v.getDouble(i); i += 1 }
        var p = 0
        while (p < Bands * Rows) {
          val row = matrix(p)
          var acc = 0.0
          i = 0
          while (i < Dims) { acc += x(i) * row(i); i += 1 }
          val b = p / Rows
          bands(b) = bands(b) * 2 + (if (acc > 0) 1 else 0)
          p += 1
        }
      }
    }
    new GenericArrayData(bands)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
