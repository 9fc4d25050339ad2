package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Random-hyperplane LSH signatures as a native codegen'd expression:
  * `graft_lsh_sigs(v, tables, bits, dim)` → array<bigint> of `tables`
  * signatures, each `bits` sign bits of hyperplane dot products —
  * tables×bits×dim multiply-adds per vector, the heaviest per-row
  * loop in the LSH index build. The hyperplane constants are the
  * md5-derived family (graft.llm.Ann.md5Plane — engine-recomputable,
  * so the DuckDB oracle replays signatures exactly), materialized once
  * per (tables, bits, dim) and shipped to generated code via a
  * reference object; accumulation order matches the oracle's
  * sequential fold bit for bit.
  *
  * tables/bits/dim must be integer literals (the plane table is sized
  * from them at plan time). A null vector yields a null signature
  * array (dropped by the posexplode downstream).
  */
case class LshSignatures(vec: Expression, tablesE: Expression,
    bitsE: Expression, dimE: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(vec, tablesE, bitsE, dimE)
  override def nullable: Boolean = vec.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_sigs"

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val intLits = Seq(tablesE, bitsE, dimE).forall {
      case Literal(_, IntegerType) => true
      case _ => false
    }
    if (vecOk && intLits) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_lsh_sigs requires (array<double>, int literal, int literal, int literal)")
  }

  private lazy val tables: Int = tablesE.eval().asInstanceOf[Int]
  private lazy val bits: Int = bitsE.eval().asInstanceOf[Int]
  private lazy val dim: Int = dimE.eval().asInstanceOf[Int]
  private lazy val planes: Array[Double] =
    Array.tabulate(tables * bits * dim)(graft.llm.Ann.md5Plane)

  private def compute(a: ArrayData): GenericArrayData = {
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        val off = (t * bits + b) * dim
        var s = 0.0
        var i = 0
        while (i < dim) { s += a.getDouble(i) * planes(off + i); i += 1 }
        sig = sig * 2 + (if (s >= 0) 1L else 0L)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null else compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("lshSigs", this, classOf[LshSignatures].getName)
    val c = vec.genCode(ctx)
    val code =
      code"""
        |${c.code}
        |boolean ${ev.isNull} = ${c.isNull};
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $self.computeJ(${c.value});
        |}
       """
    ev.copy(code = code)
  }

  /** Java-callable entry for generated code. */
  def computeJ(a: ArrayData): ArrayData = compute(a)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), tablesE = newChildren(1),
      bitsE = newChildren(2), dimE = newChildren(3))
}
