package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for vector distances over
  * `ArrayType(DoubleType)` columns.
  *
  * The composable form (`aggregate(zip_with(a, b, …))`, Distances.scala)
  * is correct but allocates an intermediate array plus per-element lambda
  * frames for every row — on an N² kNN that's the whole bench. These
  * expressions generate a single fused primitive loop (`doGenCode`), read
  * both arrays in place, and stay inside whole-stage codegen: no
  * allocation, no boxing, no virtual calls in the hot path.
  *
  * Semantics match the composable form exactly: summation is
  * left-to-right (bit-for-bit identical values), a length mismatch yields
  * NULL (zip_with pads with null → null arithmetic), and a null element
  * yields NULL. The per-element null check is only emitted when the input
  * array type says elements can be null, so the common non-nullable hot
  * path stays branch-free.
  */
abstract class ArrayDistanceExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // always nullable: a length mismatch yields NULL even when both inputs
  // are non-nullable — and without this override nullSafeCodeGen pins
  // isNull to a constant for non-nullable children, making the generated
  // `isNull = true` assignments uncompilable (silent interpreter fallback)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName arguments must be array<double>, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  protected def elementsNullable: Boolean =
    Seq(left.dataType, right.dataType).exists {
      case ArrayType(_, n) => n
      case _ => false
    }

  /** Per-pair scalar kernel over equal-length, null-free arrays. */
  protected def evalArrays(x: ArrayData, y: ArrayData, n: Int): Double

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    if (elementsNullable) {
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        i += 1
      }
    }
    evalArrays(x, y, n)
  }

  /** Loop body pieces for codegen: (accumulator declarations,
    * per-element statement(s), final assignment to `ev.value`). The
    * element index variable is `i`, inputs `a`/`b`. */
  protected def genLoop(ctx: CodegenContext, ev: ExprCode,
                        a: String, b: String, i: String): (String, String, String)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val (decls, accum, finish) = genLoop(ctx, ev, a, b, i)
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  $decls
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $accum
         |  }
         |  if (!${ev.isNull}) {
         |    $finish
         |  }
         |}
       """.stripMargin
    })
}

/** Σ (aᵢ − bᵢ)² — squared euclidean distance. */
case class SqEuclideanDistance(left: Expression, right: Expression)
    extends ArrayDistanceExpression {

  override protected def evalArrays(x: ArrayData, y: ArrayData, n: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1 }
    s
  }

  override protected def genLoop(ctx: CodegenContext, ev: ExprCode,
                                 a: String, b: String, i: String): (String, String, String) = {
    val acc = ctx.freshName("acc")
    val d = ctx.freshName("d")
    (s"double $acc = 0.0;",
      s"double $d = $a.getDouble($i) - $b.getDouble($i); $acc += $d * $d;",
      s"${ev.value} = $acc;")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_sqeuclidean"
}

/** √ Σ (aᵢ − bᵢ)² — euclidean distance, fused (no separate sqrt node). */
case class EuclideanDistance(left: Expression, right: Expression)
    extends ArrayDistanceExpression {

  override protected def evalArrays(x: ArrayData, y: ArrayData, n: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  override protected def genLoop(ctx: CodegenContext, ev: ExprCode,
                                 a: String, b: String, i: String): (String, String, String) = {
    val acc = ctx.freshName("acc")
    val d = ctx.freshName("d")
    (s"double $acc = 0.0;",
      s"double $d = $a.getDouble($i) - $b.getDouble($i); $acc += $d * $d;",
      s"${ev.value} = java.lang.Math.sqrt($acc);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_euclidean"
}

/** Σ aᵢ·bᵢ — dot product. */
case class DotProduct(left: Expression, right: Expression)
    extends ArrayDistanceExpression {

  override protected def evalArrays(x: ArrayData, y: ArrayData, n: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def genLoop(ctx: CodegenContext, ev: ExprCode,
                                 a: String, b: String, i: String): (String, String, String) = {
    val acc = ctx.freshName("acc")
    (s"double $acc = 0.0;",
      s"$acc += $a.getDouble($i) * $b.getDouble($i);",
      s"${ev.value} = $acc;")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot"
}

/** dot/(‖a‖·‖b‖) — cosine *similarity*, one fused pass computing all three
  * accumulators (the composable form runs three separate array traversals
  * with three intermediate arrays). `1 − this` agrees bit-for-bit with
  * the scalar kernel `Distances.cosine`. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends ArrayDistanceExpression {

  override protected def evalArrays(x: ArrayData, y: ArrayData, n: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def genLoop(ctx: CodegenContext, ev: ExprCode,
                                 a: String, b: String, i: String): (String, String, String) = {
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val xv = ctx.freshName("xv")
    val yv = ctx.freshName("yv")
    (s"double $dot = 0.0; double $na = 0.0; double $nb = 0.0;",
      s"""double $xv = $a.getDouble($i);
         |double $yv = $b.getDouble($i);
         |$dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;""".stripMargin,
      s"${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_cosine_sim"
}
