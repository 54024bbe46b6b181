package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Tight-loop MinHash helper, called from both interpreted eval and the
  * generated code (a static call keeps the surrounding projection inside
  * whole-stage codegen without inlining a two-level loop into Janino).
  */
object MinHashSigs {

  /** Slots of this value mark an EMPTY shingle set. (A set of only null
    * elements is different: each null hashes to the k-seed alone, so its
    * slots are the per-k seed values — shared by every all-null set, the
    * same "spurious agreement" hazard as the sentinel. Unreachable from
    * the shingle pipeline, whose elements are non-null; direct callers
    * feeding nullable arrays should pre-filter nulls.) */
  val EmptySlot: Long = Long.MaxValue

  /** mh[k] = min over shingles s of xxhash64(k, s), k = 0..k-1.
    *
    * Bit-identical to the declarative form it replaces —
    * `transform(sequence(0, K-1), k => array_min(transform(sh, s =>
    * xxhash64(k, s))))` — because it chains the SAME
    * [[XxHash64Function]] steps Spark's `xxhash64(int, string)` does:
    * seed 42 → hash the int k → hash the UTF8 shingle. A null ELEMENT
    * hashes to the k-seed alone, exactly as `xxhash64(k, NULL)` does
    * (hash expressions skip null children). Empty shingle sets yield
    * [[EmptySlot]] sentinels where the HOF form yields nulls; both
    * band-collide only with other empty docs, whose candidate pairs the
    * final Jaccard filter drops either way (NaN ≥ τ is false).
    */
  def compute(sh: ArrayData, k: Int): ArrayData = {
    val n = sh.numElements()
    val out = new Array[Long](k)
    var ki = 0
    while (ki < k) {
      var m = EmptySlot
      var i = 0
      val seedK = XxHash64Function.hash(ki, IntegerType, 42L)
      while (i < n) {
        val h =
          if (sh.isNullAt(i)) seedK
          else XxHash64Function.hash(sh.getUTF8String(i), StringType, seedK)
        if (h < m) m = h
        i += 1
      }
      out(ki) = m
      ki += 1
    }
    new GenericArrayData(out)
  }
}

/** `minhash_sigs(shingles, K)`: the K-element MinHash signature of a
  * string-array column as ONE native expression. The nested-HOF
  * formulation runs interpreted — per element per k it pays a lambda
  * dispatch plus boxing, K×|sh| times per row — and was ~2 s of
  * dedup_minhash_lsh's 3.5 s at sf0.1; this is the same arithmetic in a
  * primitive loop behind a codegen'd static call.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects (array<string>, positive k), got " +
        s"(${child.dataType.simpleString}, $k)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSigs.compute($c, $k);")

  override def prettyName: String = "minhash_sigs"

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `minhash_union(mh, K)`: element-wise minimum of MinHash signatures
  * across a group — the sketch of the UNION of the group members'
  * shingle sets, because min(minA, minB) over a hash family IS the min
  * over A ∪ B. A [[TypedImperativeAggregate]] — the Catalyst-level
  * imperative-aggregate rung of the extension ladder (one below the
  * typed `Aggregator` UDAF in Extensibility): the buffer is a raw
  * `Array[Long]` mutated in place, serialized only when a partial
  * buffer crosses the shuffle. Update and merge are associative and
  * commutative, so Spark runs it with map-side partial aggregation —
  * per group per partition, exactly K longs cross the wire no matter
  * how many documents fold in. That O(K) group state is the whole
  * point of sketching at 100 TB: corpus-level similarity joins touch
  * sketches, never the shingle sets.
  */
case class MinHashUnion(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_union expects (array<bigint>, positive k), got " +
        s"(${child.dataType.simpleString}, $k)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      // strict: a signature shorter than k would leave its tail slots at
      // the Long.MaxValue sentinel, and sentinel slots AGREE across every
      // group — a silently inflated Jaccard estimate (~ +missing/k) is
      // strictly worse than failing the query (review r16; the same
      // spurious-agreement hazard the MinHashSigs EmptySlot doc pins)
      if (a.numElements() != k) throw new IllegalArgumentException(
        s"minhash_union(sig, k=$k): signature has ${a.numElements()} slots; " +
          "k must equal the minhash_sigs width that produced the column")
      var i = 0
      while (i < k) {
        if (!a.isNullAt(i)) {
          val x = a.getLong(i)
          if (x < buffer(i)) buffer(i) = x
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashUnion =
    copy(child = newChild)

  override def prettyName: String = "minhash_union"
}

object MinHash {

  /** Runtime-registration fallback; delegates to [[GraftFunctions]]
    * (the K arguments of both functions must be foldable ints). */
  def register(spark: SparkSession): Unit = GraftFunctions.register(spark)
}
