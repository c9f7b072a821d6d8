package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-membership hit counter — the sketch-side contamination
  * prefilter kernel: counts how many elements of a long-array column
  * might be members of a Bloom filter.
  *
  * A Bloom filter has NO FALSE NEGATIVES, so a document whose shingle
  * set truly overlaps the benchmark set always reports hits ≥ its true
  * overlap — the prefilter can only over-keep (by the configured fpp),
  * never lose a contaminated document.  The filter rides into
  * generated code as a codegen reference object (the standard Spark
  * mechanism for sketch-carrying expressions), so the scan stays
  * whole-stage-codegen with zero shuffle and zero joins.
  */
object BloomGate {

  /** Count of array elements the filter might contain (null elements
    * carry no membership evidence and are skipped — matching
    * VectorSim's null-element discipline). */
  def hitCountData(arr: ArrayData, bf: BloomFilter): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && bf.mightContainLong(arr.getLong(i))) c += 1
      i += 1
    }
    c
  }

  /** Column surface: `bloomHitCount(longArrayCol, filter)`. */
  def bloomHitCount(arr: Column, bf: BloomFilter): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(BloomHitCountExpr(GraftBridge.expression(arr), bf))
  }

  /** PORTABLE bloom: an explicit bitset whose k lane positions come
    * from the shared affine-permutation family
    * (((aᵢ·h + bᵢ) mod P) mod m) — same honest bloom semantics
    * (no false negatives, fpp-bounded false positives) but every bit
    * is reproducible by any engine with 64-bit integer arithmetic,
    * unlike Spark's Murmur-based [[BloomFilter]]. */
  final case class PortableBloom(bits: Array[Long], m: Long, k: Int) {
    def mightContain(h: Long): Boolean = {
      // the affine-permutation family is defined over [0, 2^32) inputs
      // (the md5-prefix hashes); a 64-bit hash would overflow a*h and
      // index an arbitrary bit — fail loudly, not subtly
      require(h >= 0 && h <= 0xFFFFFFFFL,
        s"PortableBloom hashes must be 32-bit non-negative (md5-prefix family), got $h")
      var i = 0
      while (i < k) {
        val pos = ((WindowHash.portablePermA(i) * h + WindowHash.portablePermB(i)) %
          WindowHash.portableP) % m
        if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  object PortableBloom {
    /** Optimal-geometry constructor; formulas use only arithmetic a
      * SQL mirror can repeat verbatim (ceil / floor(x + 0.5)). */
    def build(hashes: Iterable[Long], nItems: Long, fpp: Double): PortableBloom = {
      val ln2 = math.log(2.0)
      val m = math.max(64L,
        math.ceil(-(nItems.toDouble * math.log(fpp)) / (ln2 * ln2)).toLong)
      val k = math.min(WindowHash.portablePerms.size,
        math.max(1L, math.floor((m.toDouble / nItems.toDouble) * ln2 + 0.5).toLong)).toInt
      // the double-mod geometry needs m <= P: bits above P could never
      // be set (silently raising the real fpp), and a huge m would
      // overflow the Int array size below
      require(m <= WindowHash.portableP,
        s"PortableBloom geometry m=$m exceeds the permutation modulus " +
          s"${WindowHash.portableP} — shard the filter or raise fpp")
      val bits = new Array[Long](((m + 63) >>> 6).toInt)
      hashes.foreach { h =>
        require(h >= 0 && h <= 0xFFFFFFFFL,
          s"PortableBloom hashes must be 32-bit non-negative (md5-prefix family), got $h")
        var i = 0
        while (i < k) {
          val pos = ((WindowHash.portablePermA(i) * h + WindowHash.portablePermB(i)) %
            WindowHash.portableP) % m
          bits((pos >>> 6).toInt) |= 1L << (pos & 63)
          i += 1
        }
      }
      PortableBloom(bits, m, k)
    }
  }

  /** Count of array elements the portable filter might contain. */
  def portableHitCountData(arr: ArrayData, bf: PortableBloom): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && bf.mightContain(arr.getLong(i))) c += 1
      i += 1
    }
    c
  }

  /** Column surface: `portableBloomHitCount(longArrayCol, filter)`. */
  def portableBloomHitCount(arr: Column, bf: PortableBloom): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(PortableBloomHitCountExpr(GraftBridge.expression(arr), bf))
  }

  /** Scalar membership probe — the join-pruning kernel: true if the
    * filter might contain the long hash.  Codegen'd, so the probe
    * rides the scan stage inside WholeStageCodegen. */
  def mightContainData(h: Long, bf: BloomFilter): Boolean = bf.mightContainLong(h)

  /** Column surface: `bloomMightContain(longCol, filter)`. */
  def bloomMightContain(h: Column, bf: BloomFilter): Column = {
    import org.apache.spark.sql.GraftBridge
    // cast to LongType here (like VectorSim.agreeCount): the
    // interpreted eval does h.asInstanceOf[Long], which would CCE on
    // an IntegerType column even though codegen happens to widen
    GraftBridge.column(BloomMightContainExpr(
      GraftBridge.expression(h.cast(org.apache.spark.sql.types.LongType)), bf))
  }
}

/** Count of `array<long>` elements that might be members of the
  * captured Bloom filter. */
case class BloomHitCountExpr(child: Expression, bf: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_hit_count"

  override def nullSafeEval(a: Any): Any =
    BloomGate.hitCountData(a.asInstanceOf[ArrayData], bf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomGate.hitCountData($c, $bfRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of `array<long>` elements that might be members of the
  * captured [[BloomGate.PortableBloom]]. */
case class PortableBloomHitCountExpr(child: Expression, bf: BloomGate.PortableBloom)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "portable_bloom_hit_count"

  override def nullSafeEval(a: Any): Any =
    BloomGate.portableHitCountData(a.asInstanceOf[ArrayData], bf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("portableBloom", bf,
      classOf[BloomGate.PortableBloom].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomGate.portableHitCountData($c, $bfRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Scalar Bloom membership of a long hash against the captured
  * filter — the big-side pruning predicate of
  * [[graft.operators.Relational.bloomPrunedJoin]]. */
case class BloomMightContainExpr(child: Expression, bf: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(h: Any): Any =
    BloomGate.mightContainData(h.asInstanceOf[Long], bf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomGate.mightContainData($c, $bfRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
