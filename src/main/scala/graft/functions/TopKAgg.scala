package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-K per group as a PARTIAL-AGGREGATABLE custom Catalyst
  * aggregate (`graft_topk(value, id, k)`): each map task keeps a
  * K-bounded min-heap per group, the shuffle moves at most K pairs per
  * (group, map partition), and reducers merge heaps.
  *
  * This is the skew-immune form of "top N rows per group": the
  * window-rank formulation (q_window_rank, cdc_compact — kept, they
  * pin the semantics) funnels every row of a group through the one
  * reducer that owns the group's partition key, so a hot group's whole
  * history crosses the network and sorts on one core. Here a hot
  * group costs each map partition O(rows · log K) locally and the
  * exchange carries K pre-reduced pairs per partition — the same
  * pre-aggregation argument as Cdc.materialize's max_by, generalized
  * from max (K=1) to arbitrary K.
  *
  * Ordering is lexicographic on (value, id) descending; with unique
  * ids this is a total order, so results are deterministic and
  * tie-handling cannot diverge from the oracle's
  * `ORDER BY v DESC, id DESC` ranking. The heap state never exceeds K
  * entries, so buffers stay O(K) however many rows a group absorbs.
  */
case class TopKPairs(
    valueExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPairs.Buffer] {

  // k is a literal of the query, not data: evaluated once at plan time
  private lazy val k: Int = math.max(1, kExpr.eval().asInstanceOf[Number].intValue())

  // The buffer stores (Long, Long) and the declared output is LongType:
  // fractional inputs would be silently truncated through
  // Number.longValue, and a non-foldable k would NPE at plan time —
  // reject both at analysis with a readable message instead.
  override def checkInputDataTypes(): TypeCheckResult = {
    import org.apache.spark.sql.GraftSqlShim.isIntegral
    def integral(e: Expression, role: String): Option[String] =
      if (isIntegral(e.dataType)) None
      else Some(s"graft_topk $role must be an integral type " +
        s"(cast explicitly if fractional), got ${e.dataType.sql}")
    val kErr =
      if (!kExpr.foldable) Some("graft_topk k must be a literal")
      else if (!isIntegral(kExpr.dataType))
        Some(s"graft_topk k must be an integral literal, got ${kExpr.dataType.sql}")
      else if (kExpr.eval() == null) Some("graft_topk k must not be null")
      else None
    integral(valueExpr, "value").orElse(integral(idExpr, "id")).orElse(kErr)
      .map(TypeCheckResult.TypeCheckFailure)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def children: Seq[Expression] = Seq(valueExpr, idExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKPairs.Buffer =
    new TopKPairs.Buffer(k)

  override def update(b: TopKPairs.Buffer, input: InternalRow): TopKPairs.Buffer = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      b.add(v.asInstanceOf[Number].longValue(), id.asInstanceOf[Number].longValue())
    b
  }

  override def merge(b: TopKPairs.Buffer, o: TopKPairs.Buffer): TopKPairs.Buffer = {
    o.foreach(b.add)
    b
  }

  override def eval(b: TopKPairs.Buffer): Any = {
    val sorted = b.sortedDesc
    new GenericArrayData(sorted.map { case (v, id) =>
      new GenericInternalRow(Array[Any](v, id)): Any
    })
  }

  override def serialize(b: TopKPairs.Buffer): Array[Byte] = {
    val pairs = b.sortedDesc
    val bb = ByteBuffer.allocate(8 + 16 * pairs.length)
    bb.putInt(b.k).putInt(pairs.length)
    pairs.foreach { case (v, id) => bb.putLong(v).putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairs.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKPairs.Buffer(bb.getInt)
    val n = bb.getInt
    (1 to n).foreach(_ => buf.add(bb.getLong, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKPairs =
    copy(valueExpr = cs(0), idExpr = cs(1), kExpr = cs(2))
  override def prettyName: String = "graft_topk"
}

object TopKPairs {
  private val desc: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]
  /** K-bounded min-heap over (value, id); the head is the smallest
    * retained pair, evicted when a larger one arrives. */
  final class Buffer(val k: Int) {
    private val heap = mutable.PriorityQueue.empty[(Long, Long)](desc.reverse)
    def add(pair: (Long, Long)): Unit = add(pair._1, pair._2)
    def add(v: Long, id: Long): Unit = {
      if (heap.size < k) heap.enqueue((v, id))
      else if (desc.gt((v, id), heap.head)) {
        heap.dequeue(); heap.enqueue((v, id))
      }
    }
    def foreach(f: ((Long, Long)) => Unit): Unit = heap.foreach(f)
    def sortedDesc: Array[(Long, Long)] = heap.toArray.sorted(desc.reverse)
  }
}
