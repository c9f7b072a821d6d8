package graft.sources

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.core.EzFrame
import scala.jdk.CollectionConverters._

/** Arrow IPC file ("Feather v2") interchange — the Spark-side answer to
  * the reference's `to_pandas`/Arrow export (ezdata/simpletable.py:
  * 1774–1960 to_records/to_pandas conversions): a `.arrow` file written
  * here opens directly in pyarrow (`ipc.open_file` /
  * `feather.read_table`) and pandas, with no text round-trip and no
  * copy through Python objects.  Uses the Arrow Java library that ships
  * with Spark — no extra dependency.
  *
  * Scale posture: [[write]] is an EXPORT surface (driver-side stream,
  * like Fits.write) — rows flow through `toLocalIterator` one batch at
  * a time, never a whole-table collect.  [[read]] is distributed: the
  * driver reads only the footer (schema + record-batch offsets);
  * each executor task loads its own record batches from the shared
  * path, so parallelism = batch count and memory is O(one batch).
  */
object ArrowIpc {

  /** Spark → Arrow field mapping (nullable throughout; timestamps are
    * µs UTC, matching Spark's internal representation). */
  private def arrowField(f: StructField): Field = {
    def prim(dt: DataType): ArrowType = dt match {
      case BooleanType => ArrowType.Bool.INSTANCE
      case ByteType => new ArrowType.Int(8, true)
      case ShortType => new ArrowType.Int(16, true)
      case IntegerType => new ArrowType.Int(32, true)
      case LongType => new ArrowType.Int(64, true)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case StringType => ArrowType.Utf8.INSTANCE
      case BinaryType => ArrowType.Binary.INSTANCE
      case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
      case DateType => new ArrowType.Date(DateUnit.DAY)
      case other => throw new IllegalArgumentException(s"cannot export $other to Arrow")
    }
    f.dataType match {
      case ArrayType(el, _) =>
        new Field(f.name, FieldType.nullable(ArrowType.List.INSTANCE),
          java.util.List.of(new Field("item", FieldType.nullable(prim(el)), null)))
      case dt => new Field(f.name, FieldType.nullable(prim(dt)), null)
    }
  }

  private def sparkType(f: Field): DataType = f.getType match {
    case _: ArrowType.Bool => BooleanType
    case i: ArrowType.Int => i.getBitWidth match {
      case 8 => ByteType
      case 16 => ShortType
      case 32 => IntegerType
      case 64 => LongType
    }
    case fp: ArrowType.FloatingPoint =>
      if (fp.getPrecision == FloatingPointPrecision.SINGLE) FloatType else DoubleType
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Binary => BinaryType
    case _: ArrowType.Timestamp => TimestampType
    case _: ArrowType.Date => DateType
    case _: ArrowType.List => ArrayType(sparkType(f.getChildren.get(0)))
    case other => throw new IllegalArgumentException(s"cannot import Arrow $other")
  }

  private def setValue(v: FieldVector, i: Int, value: Any): Unit = (v, value) match {
    case (_, null) => v.setNull(i)
    case (x: BitVector, b: Boolean) => x.setSafe(i, if (b) 1 else 0)
    case (x: TinyIntVector, n: Byte) => x.setSafe(i, n)
    case (x: SmallIntVector, n: Short) => x.setSafe(i, n)
    case (x: IntVector, n: Int) => x.setSafe(i, n)
    case (x: BigIntVector, n: Long) => x.setSafe(i, n)
    case (x: Float4Vector, n: Float) => x.setSafe(i, n)
    case (x: Float8Vector, n: Double) => x.setSafe(i, n)
    case (x: VarCharVector, s) => x.setSafe(i, s.toString.getBytes("UTF-8"))
    case (x: VarBinaryVector, b: Array[Byte]) => x.setSafe(i, b)
    case (x: TimeStampMicroTZVector, t: java.sql.Timestamp) =>
      x.setSafe(i, t.getTime * 1000L + (t.getNanos / 1000) % 1000)
    case (x: TimeStampMicroTZVector, t: java.time.Instant) =>
      x.setSafe(i, t.getEpochSecond * 1000000L + t.getNano / 1000)
    case (x: DateDayVector, d: java.sql.Date) =>
      x.setSafe(i, d.toLocalDate.toEpochDay.toInt)
    case (x: DateDayVector, d: java.time.LocalDate) => x.setSafe(i, d.toEpochDay.toInt)
    case (x: ListVector, xs) =>
      val items: Seq[Any] = xs match {
        case s: scala.collection.Seq[_] => s.toSeq
        case a: Array[_] => a.toSeq
        case other => Seq(other)
      }
      val start = x.startNewValue(i)
      val child = x.getDataVector.asInstanceOf[FieldVector]
      items.zipWithIndex.foreach { case (el, j) => setValue(child, start + j, el) }
      x.endValue(i, items.length)
    case (x, other) => throw new IllegalArgumentException(
      s"cannot write ${other.getClass.getName} into ${x.getClass.getSimpleName}")
  }

  private def getValue(v: FieldVector, i: Int): Any = {
    if (v.isNull(i)) return null
    v match {
      case x: BitVector => x.get(i) != 0
      case x: TinyIntVector => x.get(i)
      case x: SmallIntVector => x.get(i)
      case x: IntVector => x.get(i)
      case x: BigIntVector => x.get(i)
      case x: Float4Vector => x.get(i)
      case x: Float8Vector => x.get(i)
      case x: VarCharVector => new String(x.get(i), "UTF-8")
      case x: VarBinaryVector => x.get(i)
      case x: TimeStampMicroTZVector =>
        val us = x.get(i)
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
      case x: DateDayVector => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(x.get(i)))
      case x: ListVector =>
        val child = x.getDataVector.asInstanceOf[FieldVector]
        (x.getElementStartIndex(i) until x.getElementEndIndex(i))
          .map(j => getValue(child, j))
      case other => throw new IllegalArgumentException(
        s"cannot read Arrow vector ${other.getClass.getSimpleName}")
    }
  }

  /** Write `ez` as an Arrow IPC file.  Driver-side export stream:
    * `batchRows` rows per record batch (the read-side parallelism and
    * the per-task memory unit). */
  def write(ez: EzFrame, path: String, batchRows: Int = 8192): Unit = {
    val df = ez.df
    val schema = new ArrowSchema(df.schema.fields.map(arrowField).toList.asJava)
    val alloc = new RootAllocator(Long.MaxValue)
    val root = VectorSchemaRoot.create(schema, alloc)
    val ch = new java.io.FileOutputStream(path).getChannel
    val writer = new ArrowFileWriter(root, null, ch)
    try {
      writer.start()
      val it = df.toLocalIterator()
      val vectors = root.getFieldVectors.asScala.toIndexedSeq
      while (it.hasNext) {
        root.allocateNew()
        var n = 0
        while (it.hasNext && n < batchRows) {
          val row = it.next()
          vectors.zipWithIndex.foreach { case (v, c) => setValue(v, n, row.get(c)) }
          n += 1
        }
        root.setRowCount(n)
        writer.writeBatch()
      }
      writer.end()
    } finally { writer.close(); ch.close(); root.close(); alloc.close() }
  }

  /** Distributed read of an Arrow IPC file on a shared filesystem.
    * Footer only on the driver; one task per record batch. */
  def read(spark: SparkSession, path: String): EzFrame = {
    // driver: schema + batch count from the footer
    val (sparkSchema, nBatches) = {
      val alloc = new RootAllocator(Long.MaxValue)
      val ch = new java.io.FileInputStream(path).getChannel
      val reader = new ArrowFileReader(ch, alloc)
      try {
        val fields = reader.getVectorSchemaRoot.getSchema.getFields.asScala
        (StructType(fields.map(f => StructField(f.getName, sparkType(f))).toIndexedSeq),
          reader.getRecordBlocks.size)
      } finally { reader.close(); ch.close(); alloc.close() }
    }
    val rdd = spark.sparkContext
      .parallelize(0 until nBatches, math.max(1, nBatches))
      .flatMap { bi =>
        val alloc = new RootAllocator(Long.MaxValue)
        val ch = new java.io.FileInputStream(path).getChannel
        val reader = new ArrowFileReader(ch, alloc)
        try {
          reader.loadRecordBatch(reader.getRecordBlocks.get(bi))
          val root = reader.getVectorSchemaRoot
          val vectors = root.getFieldVectors.asScala.toIndexedSeq
          // materialize the batch before closing the reader
          (0 until root.getRowCount).map { i =>
            Row.fromSeq(vectors.map(v => getValue(v, i)))
          }.toVector
        } finally { reader.close(); ch.close(); alloc.close() }
      }
    EzFrame(spark.createDataFrame(rdd, sparkSchema))
  }
}
