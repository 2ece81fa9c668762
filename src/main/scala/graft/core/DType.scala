package graft.core

import org.apache.spark.sql.types._

/** Element types supported by the engine — exactly the reference's set
  * {byte char short int long float double}
  * (reference: src/io/mandoline/dataset.clj:9-12). Values are stored in
  * row-major big-endian buffers, the same layout `ucar.ma2.Array`
  * `.getDataAsByteBuffer` produces (reference: src/io/mandoline/impl.clj:258-268),
  * so serialization is the identity and SHA-1 content addresses are
  * computed over the natural buffer.
  */
sealed abstract class DType(val name: String, val size: Int) {
  /** Spark SQL type of the exploded (coords…, value) view. `char` is
    * exposed as its UTF-16 code unit (IntegerType) to keep the oracle
    * comparisons purely numeric. */
  def sparkType: DataType

  /** Encode one value (given as a Double, the metadata JSON's number
    * representation) into big-endian bytes at `off`. */
  def put(bytes: Array[Byte], off: Int, v: Double): Unit

  /** Decode the value at `off` to Double (lossless for all types but
    * long > 2^53, which the test fixtures never exercise for fills). */
  def get(bytes: Array[Byte], off: Int): Double

  /** Decode to the natural JVM boxed value for the exploded view. */
  def getBoxed(bytes: Array[Byte], off: Int): Any

  /** NaN fill is legal only for float/double
    * (reference: src/io/mandoline/dataset.clj:14-21). */
  def allowsNaNFill: Boolean = false
}

object DType {
  case object BYTE extends DType("byte", 1) {
    val sparkType = ByteType
    def put(b: Array[Byte], o: Int, v: Double): Unit = b(o) = v.toByte
    def get(b: Array[Byte], o: Int): Double = b(o).toDouble
    def getBoxed(b: Array[Byte], o: Int): Any = b(o)
  }
  case object CHAR extends DType("char", 2) {
    val sparkType = IntegerType // UTF-16 code unit
    def put(b: Array[Byte], o: Int, v: Double): Unit = putShort(b, o, v.toChar.toShort)
    def get(b: Array[Byte], o: Int): Double = (getShort(b, o) & 0xffff).toDouble
    def getBoxed(b: Array[Byte], o: Int): Any = getShort(b, o) & 0xffff
  }
  case object SHORT extends DType("short", 2) {
    val sparkType = ShortType
    def put(b: Array[Byte], o: Int, v: Double): Unit = putShort(b, o, v.toShort)
    def get(b: Array[Byte], o: Int): Double = getShort(b, o).toDouble
    def getBoxed(b: Array[Byte], o: Int): Any = getShort(b, o)
  }
  case object INT extends DType("int", 4) {
    val sparkType = IntegerType
    def put(b: Array[Byte], o: Int, v: Double): Unit = putInt(b, o, v.toInt)
    def get(b: Array[Byte], o: Int): Double = getInt(b, o).toDouble
    def getBoxed(b: Array[Byte], o: Int): Any = getInt(b, o)
  }
  case object LONG extends DType("long", 8) {
    val sparkType = LongType
    def put(b: Array[Byte], o: Int, v: Double): Unit = putLong(b, o, v.toLong)
    def get(b: Array[Byte], o: Int): Double = getLong(b, o).toDouble
    def getBoxed(b: Array[Byte], o: Int): Any = getLong(b, o)
  }
  case object FLOAT extends DType("float", 4) {
    val sparkType = FloatType
    override val allowsNaNFill = true
    def put(b: Array[Byte], o: Int, v: Double): Unit =
      putInt(b, o, java.lang.Float.floatToIntBits(v.toFloat))
    def get(b: Array[Byte], o: Int): Double =
      java.lang.Float.intBitsToFloat(getInt(b, o)).toDouble
    def getBoxed(b: Array[Byte], o: Int): Any =
      java.lang.Float.intBitsToFloat(getInt(b, o))
  }
  case object DOUBLE extends DType("double", 8) {
    val sparkType = DoubleType
    override val allowsNaNFill = true
    def put(b: Array[Byte], o: Int, v: Double): Unit =
      putLong(b, o, java.lang.Double.doubleToLongBits(v))
    def get(b: Array[Byte], o: Int): Double =
      java.lang.Double.longBitsToDouble(getLong(b, o))
    def getBoxed(b: Array[Byte], o: Int): Any =
      java.lang.Double.longBitsToDouble(getLong(b, o))
  }

  val all: Seq[DType] = Seq(BYTE, CHAR, SHORT, INT, LONG, FLOAT, DOUBLE)
  private val byName = all.map(t => t.name -> t).toMap

  /** Lookup; throws IllegalArgumentException for unsupported names
    * (boolean, string, unsigned — reference: test/io/mandoline/dataset_test.clj:50-59). */
  def apply(name: String): DType =
    byName.getOrElse(name,
      throw new IllegalArgumentException(s"unsupported element type: $name"))

  def isSupported(name: String): Boolean = byName.contains(name)

  // big-endian primitives (ByteBuffer default order, == ucar layout)
  @inline private def putShort(b: Array[Byte], o: Int, v: Short): Unit = {
    b(o) = (v >> 8).toByte; b(o + 1) = v.toByte
  }
  @inline private def getShort(b: Array[Byte], o: Int): Short =
    (((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)).toShort
  @inline private def putInt(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v >> 24).toByte; b(o + 1) = (v >> 16).toByte
    b(o + 2) = (v >> 8).toByte; b(o + 3) = v.toByte
  }
  @inline private def getInt(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  @inline private def putLong(b: Array[Byte], o: Int, v: Long): Unit = {
    putInt(b, o, (v >> 32).toInt); putInt(b, o + 4, v.toInt)
  }
  @inline private def getLong(b: Array[Byte], o: Int): Long =
    ((getInt(b, o) & 0xffffffffL) << 32) | (getInt(b, o + 4) & 0xffffffffL)
}
