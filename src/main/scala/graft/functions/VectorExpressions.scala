package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

private[functions] trait VectorInputCheck { self: BinaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
}

/** Native dot product over two array<double> columns.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, *), 0.0, +)`)
  * allocates an intermediate array and interprets two lambdas per row;
  * this expression is a single fused primitive loop, participates in
  * whole-stage codegen, and allocates nothing. It is the hot inner op
  * of every kNN / embedding-LSH plan (SURVEY §4's codegen-hot case).
  *
  * Arrays are assumed non-null-elemented and equal-length (embedding
  * columns); the shorter length wins if they differ.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VectorInputCheck {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += x.getDouble(i) * y.getDouble(i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native random-hyperplane LSH sign bits over an array<double>
  * embedding: bit p of the result is 1 iff dot(v, plane_p) > 0, for 48
  * fixed-seed Gaussian hyperplanes. One primitive double loop per row
  * replaces 48 separate literal-array dot-product expressions (which
  * bloat the plan and re-run per sign). Bands extract as
  * `(bits >> (band*4)) & 15` — plain integer arithmetic. */
case class HyperplaneBits(child: Expression) extends UnaryExpression {

  import HyperplaneBits._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "hyperplane_bits"

  def compute(input: ArrayData): Long = {
    val n = input.numElements()
    var bits = 0L
    var p = 0
    while (p < NumPlanes) {
      val plane = Planes(p)
      val d = math.min(n, plane.length)
      var dot = 0.0
      var i = 0
      while (i < d) { dot += input.getDouble(i) * plane(i); i += 1 }
      if (dot > 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBits =
    copy(child = newChild)
}

object HyperplaneBits {
  val NumPlanes = 48
  val Dim = 64
  /** Fixed-seed Gaussian hyperplanes — the engine-wide LSH family. */
  val Planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumPlanes)(Array.fill(Dim)(rnd.nextGaussian()))
  }
}

/** Native cosine similarity over two array<double> columns — fused
  * dot/norm/norm single pass (vs three separate array traversals when
  * composed from DotProduct). Returns NaN when either norm is zero,
  * matching the composed double arithmetic. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with VectorInputCheck {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
