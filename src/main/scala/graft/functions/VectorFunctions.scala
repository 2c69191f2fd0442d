package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The built-in route — `aggregate(zip_with(a, b, (p, q) -> p * q), 0d,
  * (acc, z) -> acc + z)` — evaluates interpreted lambdas per element with
  * boxing; on a candidate-pair join that is millions of 64-element folds
  * through the interpreter. This expression generates a tight primitive
  * `double` loop inside whole-stage codegen (and matches it with an
  * identical interpreted eval), accumulating in ascending index order —
  * the same sequential fold the HOF form computes, so results are
  * bit-identical and oracle parity (SURVEY §6) is preserved.
  *
  * Assumes non-null array elements (embedding vectors); a null array
  * input yields null via the BinaryExpression null contract.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // manual check instead of ExpectsInputTypes (its types are
  // private[sql]): reject non-array<double> inputs at analysis time —
  // getDouble over e.g. float elements would silently read garbage
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    def ok(dt: DataType) = dt match {
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native fused cosine similarity over two `array<double>` columns:
  * ONE array pass accumulating the dot product and both squared norms,
  * then `dot / (sqrt(|a|²) · sqrt(|b|²))`.
  *
  * Each accumulator is the same ascending-index sequential fold that
  * [[DotProduct]] (and the HOF form) computes, and `Math.sqrt` /
  * IEEE-754 `*` `/` are exactly rounded — so the result is
  * BIT-IDENTICAL to the `vec_dot(a,b) / (sqrt(vec_dot(a,a)) *
  * sqrt(vec_dot(b,b)))` composition (FunctionsSpec pins it). Oracle
  * parity (SURVEY §6) is therefore preserved wherever it replaces
  * `cosineFromNorms`. For unequal lengths the contract still holds:
  * the dot runs over the shared prefix (as `zip_with`/`vec_dot` do)
  * while each norm covers its OWN array's full length — the tail
  * loops below mirror `vec_dot(a,a)` / `vec_dot(b,b)` exactly.
  *
  * When to use which (100 TB note): on a high-fan-in pair join where
  * each vector scores against MANY partners (e.g. brute-force top-k),
  * precomputing norms once per vector and using [[VectorFunctions
  * .cosineFromNorms]] does 1 FMA/element per pair instead of 3; the
  * fused form is for sparse pair sets (LSH candidate pairs, where a
  * vector meets O(1) partners) and ad-hoc SQL callers
  * (`cosine_sim(a, b)` via [[graft.GraftExtensions]]) who would
  * otherwise pay three separate interpreted HOF folds. Both read the
  * same 2·n·8 bytes per pair, which dominates; the fused form also
  * drops the carried `norm` column from the join payload.
  *
  * Zero-vector behavior matches the composition exactly: double
  * division is not ANSI-checked, so `0/0 → NaN`, `x/0 → ±Infinity`.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    def ok(dt: DataType) = dt match {
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires two array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    val n = math.min(na, nb)
    var dot = 0.0
    var na2 = 0.0
    var nb2 = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      na2 += xv * xv
      nb2 += yv * yv
      i += 1
    }
    i = n
    while (i < na) { val xv = x.getDouble(i); na2 += xv * xv; i += 1 }
    i = n
    while (i < nb) { val yv = y.getDouble(i); nb2 += yv * yv; i += 1 }
    dot / (math.sqrt(na2) * math.sqrt(nb2))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na2 = ctx.freshName("na2")
      val nb2 = ctx.freshName("nb2")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val la = ctx.freshName("la")
      val lb = ctx.freshName("lb")
      s"""
         |int $la = $a.numElements();
         |int $lb = $b.numElements();
         |int $n = java.lang.Math.min($la, $lb);
         |double $dot = 0.0;
         |double $na2 = 0.0;
         |double $nb2 = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv;
         |  $na2 += $xv * $xv;
         |  $nb2 += $yv * $yv;
         |}
         |for (int $i = $n; $i < $la; $i++) {
         |  double $xv = $a.getDouble($i);
         |  $na2 += $xv * $xv;
         |}
         |for (int $i = $n; $i < $lb; $i++) {
         |  double $yv = $b.getDouble($i);
         |  $nb2 += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na2) * java.lang.Math.sqrt($nb2));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the native vector expressions. */
object VectorFunctions {

  /** Sequential-order dot product (codegen'd). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** L2 norm via the same sequential fold. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine from a dot and two precomputed norms (norms should be
    * computed once per vector, never inside a pair join).
    */
  def cosineFromNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Fused one-pass cosine (see [[CosineSim]] for when to prefer it
    * over the precomputed-norm composition — bit-identical results).
    */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
}
