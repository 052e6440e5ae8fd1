package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

private[functions] object VectorInput {
  def isVector(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }
  def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  /** element read widening float→double (same value either way). */
  def get(a: ArrayData, i: Int, float: Boolean): Double =
    if (float) a.getFloat(i).toDouble else a.getDouble(i)
}

private[functions] trait VectorInputCheck { self: BinaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => VectorInput.isVector(e.dataType))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double|float> arguments, got " +
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

  @transient private lazy val lf = VectorInput.isFloat(left.dataType)
  @transient private lazy val rf = VectorInput.isFloat(right.dataType)

  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += VectorInput.get(a, i, lf) * VectorInput.get(b, i, rf); i += 1
    }
    sum
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotExpr", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

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

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorInput.isVector(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double|float>, got " +
        child.dataType.catalogString)

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "hyperplane_bits"

  @transient private lazy val cf = VectorInput.isFloat(child.dataType)

  def compute(input: ArrayData): Long = {
    val n = input.numElements()
    var bits = 0L
    var p = 0
    while (p < NumPlanes) {
      val plane = Planes(p)
      val d = math.min(n, plane.length)
      var dot = 0.0
      var i = 0
      while (i < d) { dot += VectorInput.get(input, i, cf) * plane(i); i += 1 }
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

  @transient private lazy val lf = VectorInput.isFloat(left.dataType)
  @transient private lazy val rf = VectorInput.isFloat(right.dataType)

  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = VectorInput.get(a, i, lf); val yi = VectorInput.get(b, i, rf)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosExpr", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Sign-bit binary quantization of a 32-element slice of an embedding:
  * bit i of the result is 1 iff v[offset + i] >= 0 (missing elements
  * read as bit 0). Two calls (offset 0 and 32) pack a 64-dim float
  * vector into two BIGINT halves — a 16× size cut (8 B of codes vs
  * 256 B of floats) whose Hamming distance approximates angular
  * distance (Charikar's SimHash bound), computable with two XOR +
  * popcount ops instead of 64 float multiplies. Values stay in
  * [0, 2^32), so the packing is exactly replayable in standard SQL
  * integer arithmetic (no sign-bit overflow anywhere). */
case class SignPack32(child: Expression, offset: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorInput.isVector(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double|float>, got " +
        child.dataType.catalogString)

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "sign_pack32"

  @transient private lazy val f = VectorInput.isFloat(child.dataType)

  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    var bits = 0L
    var i = 0
    while (i < 32) {
      val j = offset + i
      if (j < n && VectorInput.get(a, j, f) >= 0) bits |= (1L << i)
      i += 1
    }
    bits
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signPackExpr", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SignPack32 =
    copy(child = newChild)
}

/** Johnson–Lindenstrauss random projection with a deterministic ±1
  * (Achlioptas) matrix: out[j] = Σ_d sign(d, j)·⌊x_d·1e6⌋ for
  * [[RandProject.OutDim]] output dimensions, where sign is a pure
  * function of (d, j) — the same engine-independent multiplicative
  * hash the shard/sampling operators use — so an external SQL engine
  * replays the whole projection with integer arithmetic. Inputs are
  * quantized to 1e-6 fixed point BEFORE the sum, making every output
  * an exact BIGINT in any partition order (the emb_centroids
  * contract); magnitudes stay ≤ Dim·|x|·1e6 ≪ 2^63. One fused
  * primitive loop per row in whole-stage codegen — the HOF
  * formulation would interpret Dim·OutDim lambda calls per row, and a
  * posexplode formulation would shuffle Dim·OutDim rows per vector. */
case class RandProject(child: Expression) extends UnaryExpression {

  import RandProject._

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorInput.isVector(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double|float>, got " +
        child.dataType.catalogString)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def prettyName: String = "rand_project"

  @transient private lazy val f = VectorInput.isFloat(child.dataType)

  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](OutDim)
    var d = 0
    while (d < n) {
      val q = math.floor(VectorInput.get(a, d, f) * 1e6).toLong
      var j = 0
      while (j < OutDim) {
        if (sign(d, j)) out(j) += q else out(j) -= q
        j += 1
      }
      d += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("randProjExpr", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): RandProject =
    copy(child = newChild)
}

object RandProject {
  val OutDim = 16
  /** true ⇒ +1 — replayed in SQL as
    * `((d*100003 + j) % 1000003 * 2654435761) % 2 = 0`. */
  def sign(d: Int, j: Int): Boolean =
    (d.toLong * 100003L + j) % 1000003L * 2654435761L % 2L == 0L
}

/** Flattened upper-triangle outer product x·xᵀ (diagonal included,
  * row-major), with the raw vector APPENDED: positions
  * [0, d(d+1)/2) hold x_i·x_j for i ≤ j, positions [d(d+1)/2,
  * d(d+1)/2 + d) hold x itself. One posexplode + sum over this array
  * accumulates the Gram matrix AND the per-dimension sums in a single
  * distributed pass — exactly the sufficient statistics (Σxxᵀ, Σx, n)
  * a covariance/PCA pass needs, so the driver can run the whole
  * eigensolve locally on a Dim×Dim matrix instead of paying one
  * cluster round-trip per power-iteration step. A fused primitive
  * loop in whole-stage codegen; d(d+3)/2 doubles per row (2144 at
  * d = 64). */
case class OuterUpper(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorInput.isVector(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double|float>, got " +
        child.dataType.catalogString)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "outer_upper"

  @transient private lazy val f = VectorInput.isFloat(child.dataType)

  def compute(a: ArrayData): ArrayData = {
    val d = a.numElements()
    val out = new Array[Double](d * (d + 1) / 2 + d)
    var k = 0
    var i = 0
    while (i < d) {
      val xi = VectorInput.get(a, i, f)
      var j = i
      while (j < d) {
        out(k) = xi * VectorInput.get(a, j, f); j += 1; k += 1
      }
      i += 1
    }
    i = 0
    while (i < d) { out(k) = VectorInput.get(a, i, f); k += 1; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("outerExpr", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): OuterUpper =
    copy(child = newChild)
}

/** Nearest centroid under squared L2 distance in shifted fixed-point
  * space — the assignment step of Lloyd's k-means. Left child is the
  * quantized vector (array<bigint>, values = ⌊x·1e6⌋ + shift), right
  * child the K×D centroid table as a FOLDABLE array<array<bigint>>
  * literal (K·D longs embedded in the plan — the broadcast-codebook
  * pattern at literal scale; re-planned per Lloyd iteration by the
  * driver, exactly like emb_pq's codebook). Distances are exact
  * BIGINTs (terms ≤ (4e6)²·D ≪ 2^63), ties break to the LOWEST
  * centroid index by a strict `<` scan in k order, so the result is
  * bit-reproducible at any parallelism and replayable with
  * ROW_NUMBER(ORDER BY dist, k) in standard SQL. One fused primitive
  * K·D loop per row inside whole-stage codegen. */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _))
        if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, foldable " +
        s"array<array<bigint>>), got ${left.dataType.catalogString} and " +
        s"${right.dataType.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("dist2_fp", LongType, nullable = false)))

  override def prettyName: String = "nearest_centroid"

  @transient private lazy val cents: Array[Array[Long]] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { k =>
      arr.getArray(k).toLongArray()
    }
  }

  def compute(a: ArrayData): Any = {
    val n = a.numElements()
    var best = -1
    var bestDist = Long.MaxValue
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      // a dimension mismatch must fail loudly, not rank on a partial
      // distance: truncating to min(n, |c|) yields a plausible but
      // wrong assignment that silently corrupts every downstream stage
      if (c.length != n) return null
      var dist = 0L
      var i = 0
      while (i < n) {
        val diff = a.getLong(i) - c(i)
        dist += diff * diff
        i += 1
      }
      if (dist < bestDist) { bestDist = dist; best = k }
      k += 1
    }
    if (best < 0) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best.toLong, bestDist))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestExpr", this)
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  $ref.compute($a);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}
