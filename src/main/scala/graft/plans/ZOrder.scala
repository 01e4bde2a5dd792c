package org.apache.spark.sql.graft
// Under org.apache.spark.sql for ExpressionUtils access; consumed through
// the public graft.plans.ZOrder facade.

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Bit-interleave (Morton / Z-order) of the low `bits` bits of two
  * non-negative longs: result bit 2i = x bit i, bit 2i+1 = y bit i.
  *
  * Sorting by the interleaved value clusters BOTH dimensions at once —
  * the multi-dimensional data-layout trick (Z-ordering) that makes
  * min/max footer stats prunable for predicates on either dimension.
  * At 100 TB this is a write-time layout choice: one range-partitioned
  * sort by zval, after which a scan with a selective predicate on x OR
  * y skips most files on parquet row-group stats alone.
  *
  * The magic-constant spread below is the published O(log bits) shift
  * trick (Morton codes); doGenCode emits it straight-line so the
  * expression stays inside whole-stage codegen. Equals the 2·bits-term
  * SQL formula Σ ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1) — pinned by
  * ZOrderSpec and replayed by the DuckDB oracle.
  */
case class ZInterleaveExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_z_interleave"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    ZInterleaveExpr.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val cls = ZInterleaveExpr.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.interleave($x, $y);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZInterleaveExpr =
    copy(left = newLeft, right = newRight)
}

object ZInterleaveExpr {
  /** Spread the low 32 bits of v to the even bit positions of a long. */
  private def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code of the low 32 bits of each input (x even, y odd). */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)
}

object ZOrderExprs {
  def interleave(x: Column, y: Column): Column =
    ExpressionUtils.column(
      ZInterleaveExpr(ExpressionUtils.expression(x),
        ExpressionUtils.expression(y)))
}
