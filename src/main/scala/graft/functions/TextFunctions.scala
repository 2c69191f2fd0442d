package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram generator over an `array<string>` token column:
  * `[tokens(i) ⧺ ' ' ⧺ … ⧺ tokens(i+n−1)]` for every window.
  *
  * The HOF form — `transform(sequence(1, size(ts) - n + 1),
  * i -> concat_ws(' ', slice(ts, i, n)))` (Portable.shingleExpr) —
  * evaluates an interpreted lambda per window AND breaks whole-stage
  * codegen (higher-order functions are not code-generated), which
  * matters because shingling sits at the bottom of every dedup and
  * n-gram plan. This expression emits the byte-identical strings from
  * a tight generated loop, so the shingle projection stays inside
  * WholeStageCodegen (FunctionsSpec pins exact equality with the HOF
  * form and the codegen property).
  *
  * Short inputs produce an EMPTY array (`size < n`), unlike the HOF
  * form whose descending `sequence` fabricates phantom windows —
  * callers guard `size(ts) >= n` anyway (see shingleExpr's doc); with
  * the guard the two are exactly equivalent.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingles requires array<string>, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements() - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) {
          parts(j) = arr.getUTF8String(i + j)
          j += 1
        }
        out(i) = UTF8String.concatWs(space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val spaceRef = ctx.addReferenceObj("space", space, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val u = classOf[UTF8String].getName
      s"""
         |int $m = $arr.numElements() - $n + 1;
         |if ($m < 0) $m = 0;
         |$u[] $out = new $u[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  $u[] $parts = new $u[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $arr.getUTF8String($i + $j);
         |  }
         |  $out[$i] = $u.concatWs($spaceRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Column-API surface for the native text expressions. */
object TextFunctions {

  /** Word n-shingles of a token-array column (codegen'd; byte-identical
    * to Portable.shingleExpr under the caller's `size >= n` guard).
    */
  def shingles(tokens: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(tokens), n))
}
