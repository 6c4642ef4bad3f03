package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType,
  DoubleType, IntegerType}

/** Mergeable t-digest state (Dunning & Ertl's *merging* t-digest,
  * "Computing extremely accurate quantiles using t-digests"): a sorted
  * centroid list whose per-centroid weight is bounded by the k1 scale
  * function δ/(2π)·asin(2q−1), so tail quantiles keep near-singleton
  * resolution while the median region compresses aggressively.
  *
  * New points land in a flat buffer and are folded into the centroid
  * list by a single sorted merge pass once the buffer fills — O(δ)
  * memory regardless of input size, and `mergeWith` (partial-aggregate
  * combine) is the same pass over two centroid lists. The digest is a
  * commutative monoid up to centroid granularity: results across
  * different partitionings agree within the k1 rank-error bound
  * (~1/compression), which is exactly what TDigestSpec pins. */
final class TDigest(val compression: Double) extends Serializable {
  import TDigest._

  var totalWeight: Long = 0L
  var minVal: Double = Double.PositiveInfinity
  var maxVal: Double = Double.NegativeInfinity

  // merged centroids, ascending by mean
  private[functions] var means: Array[Double] = new Array[Double](0)
  private[functions] var weights: Array[Long] = new Array[Long](0)

  // unmerged point buffer
  private val buf: Array[Double] = new Array[Double](BufCap)
  private var nBuf: Int = 0

  def add(x: Double): Unit = {
    buf(nBuf) = x
    nBuf += 1
    totalWeight += 1
    if (x < minVal) minVal = x
    if (x > maxVal) maxVal = x
    if (nBuf == BufCap) flush()
  }

  /** k1 scale: k(q) = δ/(2π)·asin(2q−1); its inverse bounds the weight
    * a centroid ending at cumulative fraction q may absorb. */
  private def kScale(q: Double): Double =
    compression / (2.0 * math.Pi) * math.asin(math.max(-1.0,
      math.min(1.0, 2.0 * q - 1.0)))

  private def kInv(k: Double): Double = {
    val s = math.sin(2.0 * math.Pi * k / compression)
    (math.max(-1.0, math.min(1.0, s)) + 1.0) / 2.0
  }

  /** Fold the point buffer into the centroid list: sort the combined
    * (centroid, singleton) sequence by mean, then one left-to-right
    * merge pass that greedily absorbs neighbours while the k1 bound
    * allows. Deterministic for a given input sequence. */
  def flush(): Unit = {
    if (nBuf == 0) return
    val n = means.length + nBuf
    val ms = new Array[Double](n)
    val ws = new Array[Long](n)
    // merge two sorted runs: existing centroids + sorted buffer
    java.util.Arrays.sort(buf, 0, nBuf)
    var i = 0; var j = 0; var k = 0
    while (i < means.length || j < nBuf) {
      if (j >= nBuf || (i < means.length && means(i) <= buf(j))) {
        ms(k) = means(i); ws(k) = weights(i); i += 1
      } else {
        ms(k) = buf(j); ws(k) = 1L; j += 1
      }
      k += 1
    }
    nBuf = 0
    mergePass(ms, ws, n)
  }

  private def mergePass(ms: Array[Double], ws: Array[Long], n: Int): Unit = {
    if (n == 0) { means = new Array[Double](0); weights = new Array[Long](0); return }
    val total = ws.sum.toDouble
    val outM = new Array[Double](n)
    val outW = new Array[Long](n)
    var out = 0
    var curM = ms(0); var curW = ws(0)
    var wSoFar = 0.0
    var qLimit = kInv(kScale(0.0) + 1.0)
    var i = 1
    while (i < n) {
      val q = (wSoFar + curW + ws(i)) / total
      if (q <= qLimit) {
        // absorb: weighted mean keeps the centroid's center of mass
        val w2 = curW + ws(i)
        curM = curM + (ms(i) - curM) * ws(i) / w2
        curW = w2
      } else {
        outM(out) = curM; outW(out) = curW; out += 1
        wSoFar += curW
        qLimit = kInv(kScale(wSoFar / total) + 1.0)
        curM = ms(i); curW = ws(i)
      }
      i += 1
    }
    outM(out) = curM; outW(out) = curW; out += 1
    means = java.util.Arrays.copyOf(outM, out)
    weights = java.util.Arrays.copyOf(outW, out)
  }

  def mergeWith(other: TDigest): TDigest = {
    other.flush()
    flush()
    if (other.totalWeight == 0) return this
    totalWeight += other.totalWeight
    minVal = math.min(minVal, other.minVal)
    maxVal = math.max(maxVal, other.maxVal)
    val n = means.length + other.means.length
    val ms = new Array[Double](n)
    val ws = new Array[Long](n)
    var i = 0; var j = 0; var k = 0
    while (i < means.length || j < other.means.length) {
      if (j >= other.means.length ||
          (i < means.length && means(i) <= other.means(j))) {
        ms(k) = means(i); ws(k) = weights(i); i += 1
      } else {
        ms(k) = other.means(j); ws(k) = other.weights(j); j += 1
      }
      k += 1
    }
    mergePass(ms, ws, n)
    this
  }

  /** Quantile estimate by midpoint-rule interpolation over the centroid
    * CDF, with exact min/max endpoints at the tails. */
  def quantile(q: Double): Double = {
    flush()
    val n = means.length
    if (totalWeight == 0) return Double.NaN
    val t = q * totalWeight
    val wFirst = weights(0) / 2.0
    if (t <= wFirst) {
      if (wFirst <= 0) return minVal
      return minVal + (means(0) - minVal) * math.max(0.0, t) / wFirst
    }
    val wLastHalf = weights(n - 1) / 2.0
    if (t >= totalWeight - wLastHalf) {
      if (wLastHalf <= 0) return maxVal
      return means(n - 1) +
        (maxVal - means(n - 1)) *
          math.min(wLastHalf, t - (totalWeight - wLastHalf)) / wLastHalf
    }
    // midpoints: m_i = cum_i + w_i/2
    var cum = 0.0
    var i = 0
    while (i < n - 1) {
      val mi = cum + weights(i) / 2.0
      val mj = cum + weights(i) + weights(i + 1) / 2.0
      if (t >= mi && t <= mj) {
        val frac = if (mj > mi) (t - mi) / (mj - mi) else 0.0
        return means(i) + (means(i + 1) - means(i)) * frac
      }
      cum += weights(i)
      i += 1
    }
    maxVal
  }

  def serialize(): Array[Byte] = {
    flush()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(compression)
    out.writeLong(totalWeight)
    out.writeDouble(minVal)
    out.writeDouble(maxVal)
    out.writeInt(means.length)
    var i = 0
    while (i < means.length) {
      out.writeDouble(means(i)); out.writeLong(weights(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object TDigest {
  /** Unmerged-point buffer size: one merge pass per 512 points keeps
    * update cost amortized O(log δ) without a per-point sort. */
  val BufCap = 512

  def deserialize(bytes: Array[Byte]): TDigest = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = new TDigest(in.readDouble())
    d.totalWeight = in.readLong()
    d.minVal = in.readDouble()
    d.maxVal = in.readDouble()
    val n = in.readInt()
    d.means = new Array[Double](n)
    d.weights = new Array[Long](n)
    var i = 0
    while (i < n) {
      d.means(i) = in.readDouble(); d.weights(i) = in.readLong(); i += 1
    }
    d
  }
}

/** `tdigest_quantiles(x, array(q...), compression)` — native mergeable
  * quantile-sketch aggregate. The per-group state is one t-digest
  * (O(compression) memory), partials combine map-side like any
  * algebraic aggregate, and the final buffer yields every requested
  * quantile in one pass — the 100 TB shape for per-group percentiles,
  * where exact `percentile()` would shuffle the full value multiset
  * per group. Registered by GraftFunctions/GraftExtensions so it
  * resolves in SQL alongside the built-ins. */
case class TDigestQuantiles(
    child: Expression,
    quantilesExpr: Expression,
    compressionExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  private lazy val qs: Array[Double] = {
    require(quantilesExpr.foldable,
      "tdigest_quantiles: quantiles must be a foldable array literal")
    quantilesExpr.eval().asInstanceOf[ArrayData].toDoubleArray()
  }

  private lazy val compression: Double = {
    require(compressionExpr.foldable,
      "tdigest_quantiles: compression must be a foldable integer")
    val c = compressionExpr.eval().asInstanceOf[Int]
    require(c >= 20 && c <= 10000,
      s"tdigest_quantiles: compression out of range [20, 10000]: $c")
    c.toDouble
  }

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  // non-finite inputs (NaN, ±Inf) are skipped like nulls: one NaN in a
  // centroid's weighted mean would poison every quantile of the group,
  // and ±Inf degenerates the interpolation — the sketch summarizes the
  // finite distribution (TDigestSpec pins this)
  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (java.lang.Double.isFinite(x)) buffer.add(x)
    }
    buffer
  }

  override def merge(buffer: TDigest, other: TDigest): TDigest =
    buffer.mergeWith(other)

  override def eval(buffer: TDigest): Any = {
    if (buffer.totalWeight == 0) null
    else new GenericArrayData(qs.map(buffer.quantile))
  }

  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): TDigest =
    TDigest.deserialize(bytes)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, quantilesExpr.dataType, compressionExpr.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          "tdigest_quantiles needs (double, array<double>, int), got " +
            other.toString)
    }

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def children: Seq[Expression] =
    Seq(child, quantilesExpr, compressionExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), quantilesExpr = newChildren(1),
      compressionExpr = newChildren(2))

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "tdigest_quantiles"
}

object TDigestQuantiles {
  def register(spark: SparkSession): Unit = {
    GraftFunctions.registerOnce(spark, "tdigest_quantiles", exprs => {
      require(exprs.length == 3,
        s"tdigest_quantiles takes 3 arguments, got ${exprs.length}")
      TDigestQuantiles(exprs(0), exprs(1), exprs(2))
    })
    GraftFunctions.registerOnce(spark, "tdigest_agg", exprs => {
      require(exprs.length == 2,
        s"tdigest_agg takes 2 arguments, got ${exprs.length}")
      TDigestAgg(exprs(0), exprs(1))
    })
    GraftFunctions.registerOnce(spark, "tdigest_merge_quantiles", exprs => {
      require(exprs.length == 3,
        s"tdigest_merge_quantiles takes 3 arguments, got ${exprs.length}")
      TDigestMergeQuantiles(exprs(0), exprs(1), exprs(2))
    })
  }
}

/** `tdigest_agg(x, compression)` — aggregate a column into a SERIALIZED
  * t-digest (binary). The sketch-table half of the rollup lifecycle:
  * materialize per-fine-grain digests once, answer any later quantile
  * question by merging stored digests instead of re-scanning the fact
  * table (`tdigest_merge_quantiles`). The binary layout is the same
  * serde the shuffle uses, so stored sketches and in-flight partials
  * are interchangeable. */
case class TDigestAgg(
    child: Expression,
    compressionExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  private lazy val compression: Double = {
    require(compressionExpr.foldable,
      "tdigest_agg: compression must be a foldable integer")
    val c = compressionExpr.eval().asInstanceOf[Int]
    require(c >= 20 && c <= 10000,
      s"tdigest_agg: compression out of range [20, 10000]: $c")
    c.toDouble
  }

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  // same finite-values contract as tdigest_quantiles
  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (java.lang.Double.isFinite(x)) buffer.add(x)
    }
    buffer
  }

  override def merge(buffer: TDigest, other: TDigest): TDigest =
    buffer.mergeWith(other)

  override def eval(buffer: TDigest): Any = buffer.serialize()

  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): TDigest =
    TDigest.deserialize(bytes)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, compressionExpr.dataType) match {
      case (DoubleType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"tdigest_agg needs (double, int), got $other")
    }

  override def nullable: Boolean = false

  override def dataType: DataType = BinaryType

  override def children: Seq[Expression] = Seq(child, compressionExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), compressionExpr = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "tdigest_agg"
}

/** `tdigest_merge_quantiles(digest_bin, array(q...), compression)` —
  * merge SERIALIZED t-digests (a sketch-table column) and evaluate
  * quantiles on the union. The read half of the rollup lifecycle:
  * any coarser grouping of a digest table answers quantiles without
  * touching the fact table, because the digest is a mergeable partial
  * (the property q_agg_reagg demonstrates for HLL distinct counts,
  * here for quantiles). */
case class TDigestMergeQuantiles(
    child: Expression,
    quantilesExpr: Expression,
    compressionExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] {

  private lazy val qs: Array[Double] = {
    require(quantilesExpr.foldable,
      "tdigest_merge_quantiles: quantiles must be a foldable array literal")
    quantilesExpr.eval().asInstanceOf[ArrayData].toDoubleArray()
  }

  private lazy val compression: Double = {
    require(compressionExpr.foldable,
      "tdigest_merge_quantiles: compression must be a foldable integer")
    val c = compressionExpr.eval().asInstanceOf[Int]
    require(c >= 20 && c <= 10000,
      s"tdigest_merge_quantiles: compression out of range [20, 10000]: $c")
    c.toDouble
  }

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(buffer: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null)
      buffer.mergeWith(TDigest.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: TDigest, other: TDigest): TDigest =
    buffer.mergeWith(other)

  override def eval(buffer: TDigest): Any = {
    if (buffer.totalWeight == 0) null
    else new GenericArrayData(qs.map(buffer.quantile))
  }

  override def serialize(buffer: TDigest): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): TDigest =
    TDigest.deserialize(bytes)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, quantilesExpr.dataType, compressionExpr.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "tdigest_merge_quantiles needs (binary, array<double>, int), " +
          s"got $other")
    }

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def children: Seq[Expression] =
    Seq(child, quantilesExpr, compressionExpr)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), quantilesExpr = newChildren(1),
      compressionExpr = newChildren(2))

  override def withNewMutableAggBufferOffset(
      newOffset: Int): TDigestMergeQuantiles =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(
      newOffset: Int): TDigestMergeQuantiles =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "tdigest_merge_quantiles"
}
