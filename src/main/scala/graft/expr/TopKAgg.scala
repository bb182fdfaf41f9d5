package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: ≤ k (sim, id) entries kept sorted by
  * (sim DESC, id ASC) — the exact ordering of the row_number window it
  * replaces. Insertion is a linear shift over ≤ k slots (k is small by
  * contract: a kNN fan-out), so update cost is O(k) worst case and O(1)
  * for the common reject (sim worse than the current k-th). */
final class TopKNeighborsBuf(val k: Int) {
  val sims = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0
  @inline private def better(s: Double, id: Long, i: Int): Boolean =
    s > sims(i) || (s == sims(i) && id < ids(i))
  def insert(s: Double, id: Long): Unit = {
    if (n == k && !better(s, id, k - 1)) return
    var pos = if (n == k) k - 1 else n
    if (n < k) n += 1
    while (pos > 0 && better(s, id, pos - 1)) {
      sims(pos) = sims(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    sims(pos) = s; ids(pos) = id
  }
  def mergeWith(o: TopKNeighborsBuf): Unit = {
    var i = 0
    while (i < o.n) { insert(o.sims(i), o.ids(i)); i += 1 }
  }
}

/** Typed-imperative top-k-neighbors aggregate: the map-side-bounded
  * replacement for `row_number().over(partitionBy(q).orderBy(sim DESC,
  * id ASC)) <= k` on an n·|collection| sim stream. The window form
  * (even with Spark 4's WindowGroupLimit) sorts every partition's sim
  * rows before limiting; this aggregate keeps a k-slot insertion buffer
  * per group, so the partial phase is one O(k) probe per row with no
  * sort, and the exchange carries one ≤ k-entry buffer per (task,
  * group). Emits array<struct<sim double, neighbor_id long>> in (sim
  * DESC, id ASC) order — posexplode to recover (rn, neighbor, sim). */
case class TopKNeighbors(simChild: Expression, idChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKNeighborsBuf] {
  require(k >= 1 && k <= 65536, "k must be in [1, 65536]")

  override def children: Seq[Expression] = Seq(simChild, idChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sim", DoubleType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (simChild.dataType, idChild.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (s, i) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (double, bigint), got " +
            s"${s.catalogString}, ${i.catalogString}")
    }

  override def createAggregationBuffer(): TopKNeighborsBuf =
    new TopKNeighborsBuf(k)

  override def update(b: TopKNeighborsBuf, input: InternalRow): TopKNeighborsBuf = {
    val s = simChild.eval(input)
    val id = idChild.eval(input)
    if (s != null && id != null)
      b.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKNeighborsBuf, o: TopKNeighborsBuf): TopKNeighborsBuf = {
    b.mergeWith(o); b
  }

  override def eval(b: TopKNeighborsBuf): Any = {
    val out = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      out(i) = InternalRow(b.sims(i), b.ids(i)); i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKNeighborsBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.n * 16)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putDouble(b.sims(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKNeighborsBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKNeighborsBuf(k)
    var i = 0
    // entries arrive already sorted; insert preserves order
    while (i < n) { b.sims(i) = bb.getDouble; b.ids(i) = bb.getLong; i += 1 }
    b.n = n
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKNeighbors =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKNeighbors =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKNeighbors =
    copy(simChild = newChildren(0), idChild = newChildren(1))
  override def prettyName: String = "topk_neighbors"
}

object TopKNeighbors {
  /** Column builder: topk_neighbors(sim, id, k) → array<struct<sim,
    * neighbor_id>> ordered (sim DESC, id ASC). */
  def topk_neighbors(sim: Column, id: Column, k: Int): Column =
    GraftColumn.column(TopKNeighbors(
      GraftColumn.expression(sim), GraftColumn.expression(id), k)
      .toAggregateExpression())
}
