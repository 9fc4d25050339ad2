package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles as a native expression:
  * `graft_shingles(text, n)` → array<string>, each distinct n-token
  * window of the whitespace-tokenized text joined with single spaces,
  * in first-occurrence order. One pass over the token array — the
  * equivalent transform(sequence)/slice/concat_ws/array_distinct
  * chain evaluates three interpreted higher-order functions, and a
  * Scala UDF pays the encoder round-trip for the output array. This
  * narrow stage is the floor of every dedup operator's runtime.
  *
  * Null or too-short text yields an empty array (explode then emits
  * no rows, matching the SQL formulation's null propagation). */
case class Shingles(text: Expression, nE: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(text, nE)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, nE) match {
      case (StringType, Literal(_, IntegerType)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_shingles requires (string, int literal)")
    }

  private lazy val n: Int = nE.eval().asInstanceOf[Int]

  def computeJ(t: UTF8String): GenericArrayData = {
    if (t == null) return new GenericArrayData(Array.empty[Any])
    val w = t.toString.trim.split("\\s+")
    if (w.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](w.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= w.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(w(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    computeJ(text.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingles", this, classOf[Shingles].getName)
    val c = text.genCode(ctx)
    val code =
      code"""
        |${c.code}
        |boolean ${ev.isNull} = false;
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  $self.computeJ(${c.isNull} ? null : ${c.value});
       """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), nE = newChildren(1))
}
