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

  /** Kirsch–Mitzenmacher bloom probe: h1/h2 are the digest's first two
    * 4-byte words (== the two leading 8-hex-char halves the SQL oracle
    * reads), position_j = (h1 + j·h2) mod mBits; true iff every probed
    * bit is set. One digest, k integer probes, zero allocation. */
  def bloomMight(bits: Array[Byte], s: String, k: Int, mBits: Int): Boolean = {
    val d = digest.get()
    d.reset()
    val b = d.digest(s.getBytes(StandardCharsets.UTF_8))
    val h1 = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
    val h2 = ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
      ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    var j = 0
    while (j < k) {
      val p = ((h1 + j * h2) % mBits).toInt
      if (((bits(p >>> 3) >> (p & 7)) & 1) == 0) return false
      j += 1
    }
    true
  }

  /** Top 32 bits of md5(s) as an unsigned long — the value
    * `Long.parseLong(md5Hex(s).take(8), 16)` would give, without the hex
    * round-trip. Per-row hot paths (streaming HLL) use this. */
  def md5Top32(s: String): Long = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(StandardCharsets.UTF_8))
    ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
      ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
  }

  /** Distinct 3-word shingles; limit -1 matches Spark split's
    * trailing-empty behavior.
    *
    * Locale.ROOT deliberately: the kernels must be deterministic across
    * JVMs, and ROOT matches DuckDB's locale-independent lower(). Spark's
    * own `lower()` falls back to the DEFAULT JVM locale for non-ASCII
    * (UTF8String → String.toLowerCase), so on an exotic-locale JVM
    * (tr_TR dotless-i) the DECLARATIVE reference forms can diverge from
    * the kernels on non-ASCII text — the kernels are the contract; the
    * declarative forms exist as semantics documentation and are compared
    * on ASCII fixtures. */
  /** Unicode NFC normalization (UAX#15) — the canonical-composition
    * pre-pass a text pipeline runs before hashing/dedup (a decomposed
    * `e` + U+0301 and the precomposed `é` must not count as different
    * documents). java.text.Normalizer is locale-independent by spec. */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    // fast path: quickly-checked-normalized strings (all ASCII included)
    // skip the composer entirely
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

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

  /** 16-bit SimHash over the multiplicity-preserving token md5s — the
    * kernel form of q30's declarative program (16 nibble-bit votes per
    * token hash, bit b set iff its vote sum is positive; bit order
    * MSB-first: bit b contributes `1 << (15-b)`). One md5 per token, one
    * pass, instead of 16 interpreted `aggregate` HOFs per row. */
  def simhash16(text: UTF8String): Long = {
    val t = text.toString.toLowerCase(Locale.ROOT).split("\\s+", -1)
    val votes = new Array[Int](16)
    var j = 0
    while (j < t.length) {
      val h = md5Hex(t(j))
      var b = 0
      while (b < 16) {
        val nib = Character.digit(h.charAt(b / 4), 16)
        val bit = (b % 4: @annotation.switch) match {
          case 0 => nib >= 8
          case 1 => nib % 8 >= 4
          case 2 => nib % 4 >= 2
          case _ => nib % 2 == 1
        }
        votes(b) += (if (bit) 1 else -1)
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) {
      if (votes(b) > 0) out |= 1L << (15 - b)
      b += 1
    }
    out
  }


  /** 64-bit SimHash — [[simhash16]] widened to the production fingerprint
    * width (first 16 md5 hex chars, MSB-first). Bit 0 maps to the sign
    * bit: ORing `1L << 63` is the same two's-complement value the oracle
    * builds by adding Long.MinValue — the bit patterns are identical. */
  def simhash64(text: UTF8String): Long = {
    val t = text.toString.toLowerCase(Locale.ROOT).split("\\s+", -1)
    val votes = new Array[Int](64)
    var j = 0
    while (j < t.length) {
      val h = md5Hex(t(j))
      var b = 0
      while (b < 64) {
        val nib = Character.digit(h.charAt(b / 4), 16)
        val bit = (b % 4: @annotation.switch) match {
          case 0 => nib >= 8
          case 1 => nib % 8 >= 4
          case 2 => nib % 4 >= 2
          case _ => nib % 2 == 1
        }
        votes(b) += (if (bit) 1 else -1)
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= 1L << (63 - b)
      b += 1
    }
    out
  }

  /** K-wide minhash over an ARBITRARY element array (the text variant
    * below shingles internally): min over elements of md5("i:elem") per
    * hash index — order-insensitive, so callers may build the element
    * list in any order. */
  def minhashOf(elems: ArrayData, k: Int): ArrayData = {
    val n = elems.numElements()
    val mins = new Array[String](k)
    var j = 0
    while (j < n) {
      val e = elems.getUTF8String(j)
      if (e != null) {
        val s = e.toString
        var i = 0
        while (i < k) {
          val h = md5Hex(i.toString + ":" + s)
          if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(
      mins.map(m => (if (m == null) null else UTF8String.fromString(m)): Any))
  }

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
/** `graft_nfc(text)` → STRING: Unicode NFC normalization (UAX#15), as a
  * native codegen'd Expression — no UDF, no interpreted fallback. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_nfc expects STRING")

  override def nullSafeEval(t: Any): Any =
    TextHashUtil.nfc(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextHashUtil.nfc($t)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

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

/** `graft_simhash(text)` → BIGINT: 16-bit SimHash of the token stream. */
case class SimHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_simhash expects STRING")

  override def nullSafeEval(t: Any): Any =
    TextHashUtil.simhash16(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextHashUtil.simhash16($t)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}


/** `graft_simhash64(text)` → BIGINT: 64-bit SimHash of the token stream. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_simhash64 expects STRING")

  override def nullSafeEval(t: Any): Any =
    TextHashUtil.simhash64(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextHashUtil.simhash64($t)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `graft_minhash(text, k)` → ARRAY<STRING>: per-seed minima of
  * md5("seed:shingle") hex — the MinHash signature. */
/** `graft_minhash_arr(elements, k)` → K-wide minhash signature over an
  * arbitrary string-array element set (the weighted-LSH expansion path:
  * a term with tf = n contributes elements term#1..term#n, making plain
  * set-minhash estimate the WEIGHTED Jaccard). */
case class MinHashSigArr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash_arr"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_minhash_arr expects (ARRAY<STRING>, INT)")
  }

  override def nullSafeEval(a: Any, k: Any): Any =
    TextHashUtil.minhashOf(a.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) =>
      s"${ev.value} = graft.functions.TextHashUtil.minhashOf($a, $k);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): MinHashSigArr =
    copy(left = newLeft, right = newRight)
}

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
