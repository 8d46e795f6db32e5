package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Deterministic ±1 sign for flat index `i` of a seeded JL matrix — a
  * splitmix64-style bit mix, so every executor (and any engine, for oracle
  * purposes) derives the identical matrix from the scalar seed alone. */
object RpSigns {
  def sign(seed: Long, flat: Long): Double = {
    var z = seed + flat * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    if (((z ^ (z >>> 31)) & 1L) == 0L) 1.0 else -1.0
  }

  /** The dim × m matrix, row-major (`signs(i*m + j)`). */
  def matrix(dim: Int, m: Int, seed: Long): Array[Double] =
    Array.tabulate(dim * m)(f => sign(seed, f.toLong))
}

/** Johnson–Lindenstrauss ±1 sketch: `vec (dim) → proj (m)`, one native
  * fused loop.
  *
  * The composable formulation — m unrolled `±vec(i)` sum chains — is
  * correct but generates a 2·dim·m-node expression tree; past ~1k nodes
  * janino rejects the generated method (64 KB limit) and the whole stage
  * silently falls back to interpreted eval, which is exactly the hot path
  * an N·Q shortlist scan cannot afford. This expression generates a
  * compact two-level loop instead (the sign matrix rides along as a
  * reference object, shared per task), stays inside whole-stage codegen
  * at any (dim, m), and allocates only the m-element output per row.
  *
  * NULL contract: a NULL input, a length ≠ dim, or (when the array type
  * admits it) a NULL element yields NULL — mismatched vectors must
  * surface as missing sketches, not as a wrong projection.
  */
case class RandomProjectSketch(child: Expression, dim: Int, m: Int, seed: Long)
    extends UnaryExpression {

  require(dim > 0 && m > 0, s"dim/m must be positive, got $dim/$m")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rp_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName argument must be array<double>, got ${other.simpleString}")
  }

  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }

  @transient private lazy val signs: Array[Double] = RpSigns.matrix(dim, m, seed)

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    if (elementsNullable) {
      var i = 0
      while (i < dim) { if (x.isNullAt(i)) return null; i += 1 }
    }
    val out = new Array[Double](m)
    var i = 0
    while (i < dim) {
      val v = x.getDouble(i)
      val base = i * m
      var j = 0
      while (j < m) { out(j) += v * signs(base + j); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val signsRef = ctx.addReferenceObj("rpSigns", signs, "double[]")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[$m];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $nullCheck
         |    double $v = $a.getDouble($i);
         |    for (int $j = 0; $j < $m; $j++) {
         |      $out[$j] += $v * $signsRef[$i * $m + $j];
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
