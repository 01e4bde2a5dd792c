package org.apache.spark.sql.graft
// Lives under org.apache.spark.sql to access private[sql] APIs
// (AbstractDataType, ExpressionUtils) — standard extension-expression
// pattern; consumed through the public graft.plans facade below.

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot-product over two double arrays.
  *
  * The HOF formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)` allocates
  * an intermediate array and boxes every element per row; this expression
  * generates a tight primitive loop (and participates in whole-stage
  * codegen), which matters when a near-dup join evaluates millions of
  * pairs. Same left-to-right summation order as the HOF version and the
  * DuckDB oracle's list_dot_product, so results are bit-identical.
  *
  * Null handling: null arrays propagate null (BinaryExpression default);
  * a null ELEMENT nulls the whole result — exactly what the HOF
  * formulation does (null*x -> null, null+acc -> null), so the optimizer
  * rule below is semantics-preserving.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_product"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null // zip_with pads→null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst squared Euclidean distance Σ(aᵢ−bᵢ)² over two double
  * arrays — same rationale as [[DotProductExpr]]: the HOF formulation
  * `aggregate(zip_with(a, b, (x,y) => (x−y)*(x−y)), 0.0, _+_)` is a
  * CodegenFallback that allocates and boxes per row, which dominates
  * quantizer training/encode passes evaluating m·k of these per vector.
  * Left-to-right accumulation order matches the HOF version and DuckDB's
  * list_reduce fold, so results are bit-identical. */
case class SqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq_dist"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null // zip_with pads→null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $x.getDouble($i) - $y.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistExpr =
    copy(left = newLeft, right = newRight)
}

/** [[DotProductExpr]] over FLOAT arrays, accumulating in double.
  * float→double widening is exact, and the fold order matches, so
  * fdot(fa, fb) ≡ dot(transform(fa, double), transform(fb, double))
  * bit-for-bit — WITHOUT materializing the widened copies. This is the
  * shuffle-payload expression for the LSH fused bucket join: shipping
  * the original float vectors instead of widened doubles halves the
  * wide exchange and the join's row-copy memory traffic. */
case class FloatDotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_float_dot_product"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProductExpr =
    copy(left = newLeft, right = newRight)
}

object GraftExprs {
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProductExpr(ExpressionUtils.expression(a),
        ExpressionUtils.expression(b)))
  def fdot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatDotProductExpr(ExpressionUtils.expression(a),
        ExpressionUtils.expression(b)))
  def sqDist(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SqDistExpr(ExpressionUtils.expression(a),
        ExpressionUtils.expression(b)))

  /** Spark's runtime-filter Bloom sketch as a user-callable aggregate:
    * builds a fixed-size filter over xxhash64(child) longs. Not exposed
    * in the public FunctionRegistry, hence this bridge. */
  def bloomAgg(child: Column, estimatedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(ExpressionUtils.expression(child),
          Literal(estimatedItems), Literal(numBits), 0, 0)
        .toAggregateExpression())
  }

  /** Probe the serialized Bloom filter (a CONSTANT — collect the
    * aggregate to the driver and pass lit(bytes)) with an xxhash64 long.
    * No false negatives; false positives are confirmed downstream. */
  def mightContain(bloomBytes: Column, value: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ExpressionUtils.expression(bloomBytes),
        ExpressionUtils.expression(value)))

  /** A one-row, one-column DataFrame as a SCALAR SUBQUERY expression —
    * Spark's own runtime-filter ship vehicle (InjectRuntimeFilter builds
    * exactly this around its BloomFilterAggregate). The subquery
    * executes once as its own job and its value reaches probe tasks
    * through the stage's broadcast task binary, so a multi-MB Bloom
    * filter never sits in the expression tree the way a lit(bytes)
    * literal does (every plan copy/render carried the bytes). */
  def scalarSubquery(df: org.apache.spark.sql.DataFrame): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        df.queryExecution.analyzed))
}
