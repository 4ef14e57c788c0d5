package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled text-hashing kernels for the dedup path.
  *
  * The declarative form — `array_distinct(transform(sequence(...), ...))`
  * nested in `transform(..., md5(...))` under `array_min` — is correct but
  * every higher-order function is CodegenFallback: the 3-gram + k×md5 loop
  * runs through interpreted expression dispatch per row. These kernels
  * keep the exact same semantics (Java-regex whitespace split with
  * trailing-empty retention = Spark `split`; lowercase; distinct 3-gram
  * shingles; min of md5("i:shingle") hex) but execute as one compiled
  * static call per row inside whole-stage codegen.
  */
object TextHashUtil {

  private val digest = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))
  private val HEX = "0123456789abcdef".toCharArray

  def md5Hex(s: String): String = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Distinct 3-word shingles; limit -1 matches Spark split's
    * trailing-empty behavior. */
  def shingleStrings(text: String): Array[String] = {
    val t = text.toLowerCase(Locale.ROOT).split("\\s+", -1)
    if (t.length < 3) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < t.length) {
      seen.add(t(i) + " " + t(i + 1) + " " + t(i + 2))
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  def shingles(text: UTF8String): ArrayData =
    new GenericArrayData(
      shingleStrings(text.toString).map(UTF8String.fromString(_): Any))

  def minhash(text: UTF8String, k: Int): ArrayData = {
    val sh = shingleStrings(text.toString)
    val mins = new Array[String](k)
    var j = 0
    while (j < sh.length) {
      var i = 0
      while (i < k) {
        val h = md5Hex(i.toString + ":" + sh(j))
        if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(
      mins.map(m => (if (m == null) null else UTF8String.fromString(m)): Any))
  }
}

/** `graft_shingles(text)` → ARRAY<STRING> of distinct 3-gram shingles. */
case class ShingleSet(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_shingles expects STRING")

  override def nullSafeEval(t: Any): Any =
    TextHashUtil.shingles(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextHashUtil.shingles($t)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** `graft_minhash(text, k)` → ARRAY<STRING>: per-seed minima of
  * md5("seed:shingle") hex — the MinHash signature. */
case class MinHashSig(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_minhash expects (STRING, INT)")

  override def nullSafeEval(t: Any, k: Any): Any =
    TextHashUtil.minhash(t.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = graft.functions.TextHashUtil.minhash($t, $k);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
}
