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

/** Native 48-bit SimHash over an `array<string>` token column: for each
  * token occurrence, parse the first 12 hex digits of its md5 (= first
  * 6 digest bytes, big-endian) as a 48-bit value, add ±1 per bit
  * position, and pack `sign(sum) > 0` bits into a BIGINT.
  *
  * Per-OCCURRENCE ±1 sums equal the count-weighted per-(doc, token)
  * groupBy sums (`cnt × sign ≡ sign summed per occurrence`), so this
  * per-row expression replaces the batch pipeline's tokenize →
  * (doc, token) count shuffle → 48-column aggregation with ZERO
  * shuffle — the signature never leaves the scan projection — and the
  * DuckDB oracle (which still computes the count-weighted SQL form)
  * pins the equivalence bit-for-bit. The earlier HOF fold
  * (aggregate/zip_with over a 48-element state array) computed the
  * same thing through interpreted lambdas; this is the same loop,
  * generated (FunctionsSpec pins equality with both forms).
  */
case class SimHash48(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash48 requires array<string>, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "simhash48"

  override def nullSafeEval(input: Any): Any =
    SimHash48.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.SimHash48.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}

object SimHash48 {

  val Bits = 48

  /** The whole signature in one tight loop — called from both the
    * interpreted and the generated path (a static call keeps the
    * expression inside WholeStageCodegen without inlining the digest
    * machinery into generated Java).
    */
  def compute(tokens: ArrayData): Long = {
    val sums = new Array[Int](Bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      md.reset()
      val digest = md.digest(tok.getBytes)
      // first 6 bytes big-endian = first 12 hex digits of the hex form
      var hv = 0L
      var b = 0
      while (b < 6) {
        hv = (hv << 8) | (digest(b) & 0xffL)
        b += 1
      }
      var i = 0
      while (i < Bits) {
        if (((hv >>> i) & 1L) == 1L) sums(i) += 1 else sums(i) -= 1
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < Bits) {
      if (sums(i) > 0) out |= 1L << i
      i += 1
    }
    out
  }
}

/** Native K-window (pos, md5) generator over an `array<string>` token
  * column: one struct per sliding K-token window, `h` = the md5 hex of
  * the window's tokens joined by a single space — byte-identical to
  * `md5(concat_ws(' ', slice(ts, i+1, k)))` per position (FunctionsSpec
  * pins exact equality with that HOF form).
  *
  * This is the bottom of every span-dedup plan (the window store
  * build, the live spans/clean/decontaminate twins, the streaming
  * intake gate). The HOF form evaluates an interpreted lambda per
  * window, allocating a slice array + a joined string per position and
  * breaking whole-stage codegen; this expression streams each window's
  * token bytes straight into one reused MessageDigest — no slice, no
  * joined-string allocation — from a static call that keeps the
  * projection inside WholeStageCodegen (the [[SimHash48]] discipline).
  *
  * Short inputs (`size < k`) produce an EMPTY array, unlike the HOF
  * form whose descending `sequence` fabricates phantom windows —
  * callers guard `size(ts) >= k` anyway (the [[WordShingles]]
  * contract); with the guard the two are exactly equivalent.
  */
case class WindowHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"window size must be >= 1, got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"window_hashes requires array<string>, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("h", StringType,
        nullable = false))),
    containsNull = false)

  override def prettyName: String = "window_hashes"

  override def nullSafeEval(input: Any): Any =
    WindowHashes.compute(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.WindowHashes.compute($arr, $k);")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {

  private val HexDigits = "0123456789abcdef".toCharArray

  /** All windows in one tight loop — called from both the interpreted
    * and the generated path. Each window's token bytes stream into a
    * reused MessageDigest with single-space separators: the digest
    * input is byte-identical to `concat_ws(' ', slice(...))`'s UTF-8
    * form without ever materializing the joined string.
    */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      md.reset()
      // null tokens are SKIPPED, separator and all — exactly
      // concat_ws(' ', slice(...))'s semantics, so the expression stays
      // byte-identical to the HOF reference form even on null-bearing
      // arrays (the declared input type allows containsNull = true;
      // split() output never has nulls, but windowHashes is a general
      // Column API and a null element must not NPE the task — ADVICE
      // r16; FunctionsSpec pins the null-bearing equality)
      var wrote = false
      var j = 0
      while (j < k) {
        if (!tokens.isNullAt(i + j)) {
          if (wrote) md.update(' '.toByte)
          md.update(tokens.getUTF8String(i + j).getBytes)
          wrote = true
        }
        j += 1
      }
      val digest = md.digest()
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexDigits((digest(b) >> 4) & 0xf)
        hex(2 * b + 1) = HexDigits(digest(b) & 0xf)
        b += 1
      }
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        i.toLong, UTF8String.fromString(new String(hex)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native feature-hashing embedder over an `array<string>` token
  * column: a `dims`-dimensional array<double> where each token
  * OCCURRENCE adds ±1 to one bucket — bucket = (first 4 md5 digest
  * bytes, big-endian) mod dims, sign = low bit of the 9th md5 hex
  * digit. The classic hashing-trick bag-of-words embedding
  * (Weinberger et al., ICML'09): cosine between two chunks'
  * vectors tracks token-multiset overlap, which is what chunk-level
  * SEMANTIC dedup ranks on (pipeline.ChunkSemantic) — a paraphrase
  * shifts few buckets while exact hashing sees a different string.
  *
  * Deterministic and oracle-portable: every derived number is md5 +
  * integer arithmetic (the [[SimHash48]] discipline — the DuckDB twin
  * parses the same hex digits by ascii arithmetic), and the vector
  * entries are small exact integers stored as doubles, so dot
  * products and norms downstream are EXACT in both engines regardless
  * of summation order. Null tokens are skipped. Zero shuffle: the
  * embedding never leaves the scan projection.
  */
case class HashFeatureVec(child: Expression, dims: Int)
    extends UnaryExpression {

  require(dims >= 1, s"dims must be >= 1, got $dims")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hash_feature_vec requires array<string>, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.DoubleType, containsNull = false)

  override def prettyName: String = "hash_feature_vec"

  override def nullSafeEval(input: Any): Any =
    HashFeatureVec.compute(input.asInstanceOf[ArrayData], dims)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.HashFeatureVec.compute($arr, $dims);")

  override protected def withNewChildInternal(newChild: Expression): HashFeatureVec =
    copy(child = newChild)
}

object HashFeatureVec {

  /** The whole vector in one tight loop — called from both the
    * interpreted and the generated path (static call keeps the
    * projection inside WholeStageCodegen, the [[SimHash48]] pattern).
    */
  def compute(tokens: ArrayData, dims: Int): ArrayData = {
    val sums = new Array[Double](dims)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        md.reset()
        val digest = md.digest(tokens.getUTF8String(t).getBytes)
        // first 4 bytes big-endian = first 8 hex digits of the hex form
        var hv = 0L
        var b = 0
        while (b < 4) {
          hv = (hv << 8) | (digest(b) & 0xffL)
          b += 1
        }
        // 9th hex digit = high nibble of byte 4; its low bit is the sign
        val sgn = if (((digest(4) >> 4) & 1) == 1) 1.0 else -1.0
        sums((hv % dims).toInt) += sgn
      }
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(sums)
  }
}

/** 16-bit SIGNED-RANDOM-PROJECTION sign word of an `array<double>`
  * vector column — Charikar's SimHash for cosine similarity (STOC
  * 2002): bit `i` of table `table` is `sign(r_i · v)` with `r_i` a
  * fixed ±1 hyperplane ([[SrpMatrix]], deterministic from md5 so both
  * engines inline the identical matrix as literals).
  *
  * WHY random hyperplanes and not coordinate signs: the former band
  * key (the sign of single vector coordinates) collapses on any corpus
  * whose documents share a token-frequency profile — the sign of
  * `v[d]` is the PRESENCE of one token, identical across most docs, so
  * the whole corpus lands in a handful of buckets and the flood cap
  * drops everything (the r18 vacuous-zero-rows finding: 482 of 694
  * sf0.01 chunks shared ONE 16-bit coordinate-sign word). A ±1-mixed
  * projection folds every coordinate's COUNT into every bit, so bits
  * split count-similar docs while genuinely near-identical chunks
  * (small L2 delta) still agree on most hyperplanes — the actual LSH
  * property cosine banding needs.
  *
  * Portability: projections are sums of ±(small integer counts) —
  * exact in doubles at any summation order — and `> 0` is an exact
  * integer comparison, so Spark and the DuckDB twin (which inlines the
  * same matrix as `±vD` terms) compute identical words bit-for-bit.
  * FunctionsSpec pins eval ≡ codegen ≡ a JVM recompute.
  */
case class SrpWord16(child: Expression, table: Int)
    extends UnaryExpression {

  require(table >= 0, s"table must be >= 0, got $table")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"srp_word16 requires array<double>, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "srp_word16"

  override def nullSafeEval(input: Any): Any =
    SrpWord16.compute(input.asInstanceOf[ArrayData], table)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.SrpWord16.compute($arr, $table);")

  override protected def withNewChildInternal(newChild: Expression): SrpWord16 =
    copy(child = newChild)
}

object SrpWord16 {

  val Bits = 16

  /** One shared loop for interpreted eval and codegen (the
    * [[HashFeatureVec]] pattern). Bit 0 is the MSB of the word.
    */
  def compute(v: ArrayData, table: Int): Long = {
    val dims = v.numElements()
    val rows = SrpMatrix.rows(table, dims)
    var word = 0L
    var i = 0
    while (i < Bits) {
      val r = rows(i)
      var s = 0.0
      var d = 0
      while (d < dims) {
        s += r(d) * v.getDouble(d)
        d += 1
      }
      word = (word << 1) | (if (s > 0) 1L else 0L)
      i += 1
    }
    word
  }
}

/** The fixed ±1 hyperplane matrix behind [[SrpWord16]]: entry
  * (table j, bit i, dim d) is +1 iff the low bit of
  * `md5("srp|j|i|d")`'s first byte is set — no RNG, so the matrix is a
  * pure constant both engines can inline and a re-run can never
  * reshuffle buckets under a materialized consumer.
  */
object SrpMatrix {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  def entry(table: Int, bit: Int, dim: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"srp|$table|$bit|$dim".getBytes("UTF-8"))
    if ((d(0) & 1) == 1) 1.0 else -1.0
  }

  /** The 16 hyperplane rows of `table` at `dims` dimensions. */
  def rows(table: Int, dims: Int): Array[Array[Double]] =
    cache.computeIfAbsent((table, dims), _ =>
      Array.tabulate(SrpWord16.Bits, dims)((i, d) => entry(table, i, d)))
}

/** Column-API surface for the native text expressions. */
object TextFunctions {

  /** Word n-shingles of a token-array column (codegen'd; byte-identical
    * to Portable.shingleExpr under the caller's `size >= n` guard).
    */
  def shingles(tokens: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(tokens), n))

  /** 48-bit simhash of a token-array column (codegen'd; equals the
    * count-weighted groupBy signature exactly).
    */
  def simhash48(tokens: Column): Column =
    Bridge.column(SimHash48(Bridge.expression(tokens)))

  /** (pos, md5) structs of every K-token window of a token-array
    * column (codegen'd; byte-identical to the HOF
    * `md5(concat_ws(' ', slice))` form under the caller's
    * `size >= k` guard).
    */
  def windowHashes(tokens: Column, k: Int): Column =
    Bridge.column(WindowHashes(Bridge.expression(tokens), k))

  /** `dims`-dimensional feature-hash embedding of a token-array column
    * (codegen'd; md5-portable — see [[HashFeatureVec]]).
    */
  def hashFeatureVec(tokens: Column, dims: Int): Column =
    Bridge.column(HashFeatureVec(Bridge.expression(tokens), dims))

  /** 16-bit SRP sign word of an `array<double>` column for hyperplane
    * table `table` (codegen'd; matrix-portable — see [[SrpWord16]]).
    */
  def srpWord16(v: Column, table: Int): Column =
    Bridge.column(SrpWord16(Bridge.expression(v), table))
}
