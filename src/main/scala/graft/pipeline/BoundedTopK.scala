package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/**
 * Bounded grouped top-k as a native Catalyst aggregate.
 *
 * `child` is a struct whose FIRST `ascending.length` fields are the sort
 * key (per-field direction; null ordering matches window defaults — nulls
 * first ascending, last descending) and whose remaining field(s) carry the
 * payload. The buffer holds at most k rows, kept sorted, so partial
 * aggregation bounds every map partition's contribution to k rows per
 * group BEFORE the exchange — the same scale argument as [[TopKAgg]], but
 * for arbitrary row payloads, and without routing the whole input through
 * a Row-codec `mapPartitions` (no DeserializeToObject in the plan; the
 * stages around the aggregate stay in whole-stage codegen).
 *
 * String sort fields compare as UTF8String — binary UTF-8, exactly Spark's
 * window sort order (Java String.compareTo would diverge on
 * supplementary-plane characters).
 *
 * Ties beyond the sort key resolve by encounter order, like
 * `row_number()`: give each group a total order (include a unique key) for
 * deterministic output.
 */
case class BoundedTopK(
    child: Expression,
    k: Int,
    ascending: Seq[Boolean],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[InternalRow]] {

  require(k > 0, s"k must be positive, got $k")
  require(ascending.nonEmpty, "at least one sort field required")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def prettyName: String = "bounded_top_k"

  @transient private lazy val orderings: Array[Ordering[Any]] =
    structType.fields.take(ascending.length)
      .map(f => TypeUtils.getInterpretedOrdering(f.dataType)).toArray
  @transient private lazy val orderTypes: Array[DataType] =
    structType.fields.take(ascending.length).map(_.dataType).toArray

  private def cmp(a: InternalRow, b: InternalRow): Int = {
    var i = 0
    while (i < orderings.length) {
      val dt = orderTypes(i)
      val av = if (a.isNullAt(i)) null else a.get(i, dt)
      val bv = if (b.isNullAt(i)) null else b.get(i, dt)
      val c =
        if (av == null && bv == null) 0
        else if (av == null) -1 // nulls first ascending
        else if (bv == null) 1
        else orderings(i).compare(av, bv)
      val d = if (ascending(i)) c else -c
      if (d != 0) return d
      i += 1
    }
    0
  }

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] =
    new ArrayBuffer[InternalRow](math.min(k, 16))

  override def update(buf: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    val v = child.eval(input).asInstanceOf[InternalRow]
    if (v == null) return buf
    val n = buf.length
    if (n >= k && cmp(v, buf(n - 1)) >= 0) return buf
    // binary search for insert position (stable: ties go after)
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(v, buf(mid)) < 0) hi = mid else lo = mid + 1
    }
    buf.insert(lo, v.copy())
    if (buf.length > k) buf.remove(k)
    buf
  }

  override def merge(a: ArrayBuffer[InternalRow], b: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    val out = new ArrayBuffer[InternalRow](math.min(a.length + b.length, k))
    var i = 0
    var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && cmp(a(i), b(j)) <= 0)
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
    }
    out
  }

  override def eval(buf: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(buf.toArray[Any])

  // ONE projection per aggregate instance, NOT per serialize() call:
  // serialize runs once per GROUP at the partial→exchange boundary, and
  // UnsafeProjection.create is a codegen-cache lookup (~0.5 ms) — built
  // per call it dominated the whole aggregation (measured ~75 s CPU for
  // 168k groups in q187's final top-k; ~0 hoisted).
  @transient private lazy val serializeProj: UnsafeProjection =
    UnsafeProjection.create(structType)

  override def serialize(buf: ArrayBuffer[InternalRow]): Array[Byte] = {
    val proj = serializeProj
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { r =>
      val ur = proj(r)
      out.writeInt(ur.getSizeInBytes)
      ur.writeToStream(out, null)
    }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[InternalRow](n)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, len)
      buf += row
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(child = newChildren.head)
}
