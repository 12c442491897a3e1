package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the sequential-fold dot product of two
  * `ARRAY<DOUBLE>` columns — the hot inner loop of every similarity
  * operator (e1–e4: kNN probe, blocked near-dup, LSH, IVF).
  *
  * Why an Expression and not `aggregate(zip_with(...))`: Catalyst's
  * higher-order functions evaluate their lambda INTERPRETED, one function
  * call per element per row, even inside WholeStageCodegen. This
  * expression emits a tight primitive `for` loop via `doGenCode`, so an
  * all-pairs similarity stage does O(dim) primitive multiply-adds per
  * pair with no per-element allocation. Extension-path choice per the
  * design brief: compose built-ins first (done — the HOF form), drop to a
  * custom Expression only where the built-in is the measured bottleneck
  * (this is; the HOF fold dominated e2/e3 profiles).
  *
  * Semantics are IDENTICAL to the HOF form it replaces, bit for bit:
  *   - same left-to-right accumulation order (IEEE-754 addition is not
  *     associative; a reordered loop would break oracle hash-matches)
  *   - length mismatch → NULL (zip_with pads the shorter side with null,
  *     which poisons the sum)
  *   - any NULL element → NULL (null product poisons the fold)
  * A differential spec pins native ≡ HOF exactly (no tolerance).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  // manual type check (ExpectsInputTypes' AbstractDataType is
  // private[sql]); callers pass array<double> columns, anything else is
  // an analysis-time error, never a runtime cast surprise
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two ARRAY<DOUBLE> inputs, got " +
            s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native random-hyperplane LSH signature of an `ARRAY<DOUBLE>` vector:
  * the '0'/'1' bucket string whose bit `b` is the sign of
  * `Σ_d x_d · s(b, d)` with `s` the seeded ±1 hash
  * `xxhash64(seed, b, d) % 2 == 0 ? +1 : -1` — the scale-dominant
  * signature pass of the vector near-dup pipeline
  * ([[graft.operators.Similarity.nearDupPairs]]).
  *
  * Why an Expression: the HOF composition it replaces (`aggregate` over
  * `zip_with(vec, sequence(...))` per BIT, then `concat`) evaluates its
  * lambdas interpreted — O(bits·dim) interpreted calls and `bits`
  * separate array traversals per vector, plus a materialized index array.
  * This emits one tight nested primitive loop via `doGenCode` (the same
  * extension-path rationale as [[DotProductExpr]]; it was the last
  * interpreted HOF in a similarity hot path).
  *
  * Semantics are IDENTICAL to the HOF form, bit for bit:
  *   - per-bit accumulation is sequential left-to-right (IEEE-754
  *     addition order preserved);
  *   - the ±1 sign reproduces `pmod(xxhash64(lit(seed), lit(b), d), 2)`
  *     exactly: XxHash64's fold of (LONG seed literal, INT bit literal,
  *     INT element index) from Spark's default seed 42, parity-tested;
  *   - a NULL vector, an EMPTY vector, or any NULL element yields the
  *     all-'0' string — precisely what the HOF form produced (null/empty
  *     poison each per-bit fold to NULL, and `when(NULL >= 0)` falls to
  *     the '0' branch; empty vectors hit zip_with's null padding against
  *     the descending `sequence(0, -1)`). Never NULL itself, so the
  *     expression is non-nullable like the `concat` it replaces.
  * A differential spec pins native ≡ HOF exactly (no tolerance).
  */
case class HyperplaneSigExpr(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {

  require(bits > 0, s"bits must be positive, got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an ARRAY<DOUBLE> input, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_proj"

  // xxhash64(seed, b, d) folds left-to-right from Spark's default seed:
  // hash(d, hash(b, hash(seed, 42))) — the (constant) first link is
  // precomputed once per expression instance
  private val seedHash: Long = XXH64.hashLong(seed, 42L)

  override def eval(input: InternalRow): Any = {
    val chars = new Array[Byte](bits)
    java.util.Arrays.fill(chars, '0'.toByte)
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var bad = n == 0
      var i = 0
      while (i < n && !bad) {
        if (arr.isNullAt(i)) bad = true
        i += 1
      }
      if (!bad) {
        var b = 0
        while (b < bits) {
          val hb = XXH64.hashInt(b, seedHash)
          var s = 0.0
          var d = 0
          while (d < n) {
            val sign = if ((XXH64.hashInt(d, hb) & 1L) == 0L) 1.0 else -1.0
            s += arr.getDouble(d) * sign
            d += 1
          }
          if (s >= 0) chars(b) = '1'.toByte
          b += 1
        }
      }
    }
    UTF8String.fromBytes(chars)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val xxh = classOf[XXH64].getName
    val chars = ctx.freshName("chars")
    val arr = ctx.freshName("arr")
    val n = ctx.freshName("n")
    val bad = ctx.freshName("bad")
    val i = ctx.freshName("i")
    val b = ctx.freshName("b")
    val hb = ctx.freshName("hb")
    val s = ctx.freshName("s")
    val d = ctx.freshName("d")
    ev.copy(
      code = code"""
        |${childGen.code}
        |byte[] $chars = new byte[$bits];
        |java.util.Arrays.fill($chars, (byte) '0');
        |if (!${childGen.isNull}) {
        |  org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
        |  int $n = $arr.numElements();
        |  boolean $bad = ($n == 0);
        |  for (int $i = 0; $i < $n && !$bad; $i++) {
        |    if ($arr.isNullAt($i)) $bad = true;
        |  }
        |  if (!$bad) {
        |    for (int $b = 0; $b < $bits; $b++) {
        |      long $hb = $xxh.hashInt($b, ${seedHash}L);
        |      double $s = 0.0;
        |      for (int $d = 0; $d < $n; $d++) {
        |        $s += $arr.getDouble($d) *
        |          ((($xxh.hashInt($d, $hb) & 1L) == 0L) ? 1.0d : -1.0d);
        |      }
        |      if ($s >= 0) $chars[$b] = (byte) '1';
        |    }
        |  }
        |}
        |org.apache.spark.unsafe.types.UTF8String ${ev.value} =
        |  org.apache.spark.unsafe.types.UTF8String.fromBytes($chars);
       """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API surface for the native vector expressions. */
object VectorFunctions {

  import org.apache.spark.sql.classic.GraftSqlBridge

  /** Codegen'd sequential dot product; see [[DotProductExpr]]. */
  def dotNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProductExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Codegen'd hyperplane-LSH signature; see [[HyperplaneSigExpr]]. */
  def hyperplaneSig(vec: Column, bits: Int, seed: Long): Column =
    GraftSqlBridge.column(
      HyperplaneSigExpr(GraftSqlBridge.expression(vec), bits, seed))

  /** Bounded top-k aggregate (k-capped partial state); see
    * [[TopKAggExpr]].
    */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKAggExpr(
        GraftSqlBridge.expression(score),
        GraftSqlBridge.expression(id),
        k).toAggregateExpression())

  /** Misra-Gries frequent-items candidates: `graft_mg(item, capacity)` —
    * a capacity-bounded partial-state aggregate (see [[MgAggExpr]]).
    */
  def mgCandidates(item: Column, capacity: Int): Column =
    GraftSqlBridge.column(
      MgAggExpr(GraftSqlBridge.expression(item), capacity)
        .toAggregateExpression())

  /** Make the native expressions callable from SQL on a live session
    * (`SELECT graft_dot(a, b)`, `graft_proj(vec, 12, 42)`). New sessions
    * can instead inject [[GraftExtensions]] at build time.
    */
  def registerSqlFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftSqlBridge.registerFunction(
      spark, "graft_dot", GraftFunctionDefs.dotBuilder)
    GraftSqlBridge.registerFunction(
      spark, "graft_proj", GraftFunctionDefs.projBuilder)
    GraftSqlBridge.registerFunction(
      spark, "graft_topk", GraftFunctionDefs.topkBuilder)
    GraftSqlBridge.registerFunction(
      spark, "graft_mg", GraftFunctionDefs.mgBuilder)
    GraftSqlBridge.registerFunction(
      spark, "graft_nfc", GraftFunctionDefs.nfcBuilder)
  }
}
