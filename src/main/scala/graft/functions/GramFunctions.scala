package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `graft_gram(v ARRAY<FLOAT|DOUBLE>, mu ARRAY<DOUBLE> literal)` →
  * ARRAY<DOUBLE> of d² entries: the CENTERED second-moment (Gram) matrix
  * Σ (v−μ)(v−μ)ᵀ, flattened row-major — the map-side-combining kernel
  * behind [[graft.operators.Similarity.q227TopPc]].
  *
  * Why a custom `TypedImperativeAggregate` (tier (b) of the custom-operator
  * preference order): the DataFrame spelling of a Gram matrix is a double
  * `posexplode` — a d²-fold row multiplication (64× here) that exists only
  * to be immediately partial-aggregated away. This aggregate folds each
  * vector into a d²-double buffer IN PLACE per partition; the shuffle then
  * carries exactly one 4,096-double buffer per map task (the ideal partial-
  * aggregate shape — the explode never materializes at any scale). At
  * 100 TB this is the difference between scanning the corpus and scanning
  * the corpus × 4,096.
  *
  * Determinism contract: accumulation order differs from the exploded
  * spelling (per-partition fold + pairwise merge vs hash-aggregate), which
  * is why every consumer rounds cells to 6dp AFTER aggregation — the same
  * long-expansion-double convention as q59's means; [[Round7cSpec]] pins
  * rounded-cell equality between this kernel and the exploded spelling.
  *
  * μ must be a foldable literal (the bounded per-dim mean, computed by the
  * caller's decimal-routed pass) — evaluated once at construction, never
  * per row.
  */
case class GramMatrix(
    child: Expression,
    muExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, muExpr.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(DoubleType, _))
        if muExpr.foldable => TypeCheckResult.TypeCheckSuccess
      case (c, m) => TypeCheckResult.TypeCheckFailure(
        s"graft_gram expects (ARRAY<FLOAT|DOUBLE>, ARRAY<DOUBLE> literal), " +
          s"got ${c.sql}, ${m.sql}")
    }

  private lazy val mu: Array[Double] =
    muExpr.eval(InternalRow.empty).asInstanceOf[ArrayData].toDoubleArray()

  private lazy val childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram"
  override def children: Seq[Expression] = Seq(child, muExpr)

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](mu.length * mu.length)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val raw = child.eval(input)
    if (raw != null) {
      val v = raw.asInstanceOf[ArrayData]
      val d = mu.length
      val n = math.min(v.numElements(), d)
      val c = new Array[Double](d)
      var i = 0
      while (i < n) {
        val x = if (childIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
        c(i) = x - mu(i)
        i += 1
      }
      i = 0
      while (i < d) {
        val ci = c(i)
        val row = i * d
        var j = 0
        while (j < d) { buffer(row + j) += ci * c(j); j += 1 }
        i += 1
      }
    }
    buffer
  }

  override def merge(b: Array[Double], o: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asDoubleBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrix =
    copy(child = newChildren(0), muExpr = newChildren(1))
}
