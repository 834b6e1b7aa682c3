package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash-heavy dedup kernels.
  *
  * The declarative forms in graft.operators.Dedup (nested array
  * higher-order functions) are semantically exact but evaluate
  * interpreted — per-element lambda dispatch outside whole-stage
  * codegen. These expressions compute the identical values (same md5,
  * same universal-hash constants — oracle SQL stays valid, equality is
  * property-tested in DedupKernelSpec) in one JVM kernel call per row,
  * and participate in whole-stage codegen via defineCodeGen.
  *
  * This is the build brief's tier (b): a custom Expression where
  * composition of built-ins can't hit the required speed.
  */
object HashKernels {

  val P: Long = 1073741789L // largest prime < 2^30, matches Dedup.HashP

  // One digest per thread: getInstance-per-call was the hot-path cost of
  // every kernel (provider lookup + allocation per shingle/token).
  private val mdLocal: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def md5(bytes: Array[Byte]): Array[Byte] = {
    val m = mdLocal.get()
    m.reset()
    m.digest(bytes)
  }

  /** First 15 hex digits of md5 as an integer, mod P — identical to
    * `conv(substr(md5(s), 1, 15), 16, 10) % P`.
    */
  def baseHash(s: UTF8String): Long = {
    val d = md5(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(7) & 0xf0L) >> 4) // 15th hex digit = high nibble of byte 7
    v % P
  }

  /** 60-bit md5 slice: the integer value of 15 hex digits of the digest
    * starting at `nibbleOffset` — identical to
    * `conv(substr(md5(s), nibbleOffset+1, 15), 16, 10)` without
    * materializing the hex string or parsing it back (the hot-path cost
    * of the bloom/sampling position computations).
    */
  def md5Slice60(s: UTF8String, nibbleOffset: Int): Long = {
    val d = md5(s.getBytes)
    var v = 0L
    var i = nibbleOffset
    val end = nibbleOffset + 15
    while (i < end) {
      val nib = if ((i & 1) == 0) (d(i >> 1) & 0xf0) >> 4 else d(i >> 1) & 0x0f
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** MinHash signature over a shingle array: one md5 per shingle, n
    * universal hashes h_i = ((2i+1)·x + i²+i+7) mod P, min per i.
    * Empty input → null (callers filter empties; mirrors array_min's
    * null on empty arrays in the declarative form).
    */
  def minhashSig(shingles: ArrayData, n: Int): GenericArrayData = {
    val m = shingles.numElements()
    if (m == 0) return null
    val mins = Array.fill(n)(Long.MaxValue)
    var j = 0
    while (j < m) {
      val x = baseHash(shingles.getUTF8String(j))
      var i = 0
      while (i < n) {
        val h = ((2L * i + 1) * x + (i.toLong * i + i + 7)) % P
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** 16-bit SimHash over a token array: bit j set iff more tokens have
    * the top bit of md5 hex digit j set than not — identical to the
    * declarative simhash16FromHashes ∘ tokenMd5s.
    */
  def simhash16(tokens: ArrayData): Int = {
    val counts = new Array[Int](16)
    val m = tokens.numElements()
    var t = 0
    while (t < m) {
      val d = md5(tokens.getUTF8String(t).getBytes)
      var j = 0
      while (j < 16) {
        // hex digit j = high nibble of byte j/2 (j even) else low nibble
        val nibble = if ((j & 1) == 0) (d(j >> 1) & 0xf0) >> 4 else d(j >> 1) & 0x0f
        counts(j) += (if (nibble >= 8) 1 else -1)
        j += 1
      }
      t += 1
    }
    var v = 0
    var j = 0
    while (j < 16) { if (counts(j) > 0) v |= 1 << j; j += 1 }
    v
  }

  /** 64-bit SimHash: bit j set iff more tokens have bit j of their md5
    * digest set than not (first 64 of the 128 digest bits). The wide
    * form for bucket DEDUP decisions — 16 bits pigeonhole-collides
    * unrelated docs once a corpus passes ~10^4 documents; 64 bits keep
    * false merges negligible at any realistic size.
    */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val m = tokens.numElements()
    var t = 0
    while (t < m) {
      val d = md5(tokens.getUTF8String(t).getBytes)
      var j = 0
      while (j < 64) {
        val bit = (d(j >> 3) >> (7 - (j & 7))) & 1
        counts(j) += (if (bit == 1) 1 else -1)
        j += 1
      }
      t += 1
    }
    var v = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) v |= 1L << j; j += 1 }
    v
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5hex(s: String): String = {
    val d = md5(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) & 0xf0) >> 4)
      out(2 * i + 1) = hexDigits(d(i) & 0x0f)
      i += 1
    }
    new String(out)
  }

  /** Winnowing fingerprints (Schleimer et al. '03): md5 each ordered
    * k-gram, slide a window of `w` hashes, keep each window's
    * lexicographic min, distinct in first-occurrence order — identical
    * to the declarative Dedup.winnowFingerprints. O(n·w) with w small;
    * the declarative form materializes a slice per window and is
    * unusable at scale.
    */
  def winnow(tokens: ArrayData, k: Int, w: Int): GenericArrayData = {
    val m = tokens.numElements()
    if (m < k) return new GenericArrayData(Array.empty[Any])
    val nGrams = m - k + 1
    val kh = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      kh(i) = md5hex(sb.toString)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String]()
    if (nGrams < w) {
      var min = kh(0)
      var t = 1
      while (t < nGrams) { if (kh(t).compareTo(min) < 0) min = kh(t); t += 1 }
      seen.add(min)
    } else {
      var start = 0
      while (start <= nGrams - w) {
        var min = kh(start)
        var t = start + 1
        while (t < start + w) { if (kh(t).compareTo(min) < 0) min = kh(t); t += 1 }
        seen.add(min)
        start += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(out)
  }

  /** Sequential-fold dot product of two double arrays — identical
    * order (0.0 + a₀b₀ + a₁b₁ + …) to the declarative
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, hence bit-identical
    * doubles under any engine — INCLUDING its null semantics: zip_with
    * null-pads the shorter array and a null element nulls the fold, so
    * mismatched lengths or null elements yield NULL (surfacing the
    * data bug), never a silently-truncated partial product.
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Per-language indicator-word hit counts in ONE pass over the token
    * array — identical values to TextAnalysis.indicatorHits per
    * language, which the declarative path evaluates as one interpreted
    * higher-order filter PER language (and the argmax CASE chain
    * re-evaluates them, so the kernel saves ~15 array passes per row).
    * Language order = TextAnalysis.indicators order (alphabetic).
    */
  private lazy val indicatorSets: Array[java.util.HashSet[UTF8String]] =
    graft.operators.TextAnalysis.indicators.map { case (_, words) =>
      val s = new java.util.HashSet[UTF8String]()
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  def langScores(tokens: ArrayData): GenericArrayData = {
    val counts = new Array[Int](indicatorSets.length)
    val m = tokens.numElements()
    var t = 0
    while (t < m) {
      val tok = tokens.getUTF8String(t)
      var l = 0
      while (l < indicatorSets.length) {
        if (indicatorSets(l).contains(tok)) counts(l) += 1
        l += 1
      }
      t += 1
    }
    new GenericArrayData(counts.map(c => c: Any))
  }

  /** Positional rolling hash — identical to TextAnalysis.rollingHash's
    * declarative fold: per token, the first 7 md5 hex digits of
    * "index@token" (28 bits), folded as h = (h·31 + v) mod P —
    * INCLUDING its null semantics: the declarative form's
    * sequence(0, size-1) on an empty array null-pads the zip and the
    * fold collapses to NULL (and a null token nulls it too), so empty
    * or null-holed inputs yield NULL, not 0 — which is a legitimate
    * hash value real documents can collide with.
    */
  def rollingHash(tokens: ArrayData): java.lang.Long = {
    val m = tokens.numElements()
    if (m == 0) return null
    var acc = 0L
    var i = 0
    while (i < m) {
      if (tokens.isNullAt(i)) return null
      val d = md5((i.toString + "@" + tokens.getUTF8String(i).toString).getBytes("UTF-8"))
      val v = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) | ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >> 4)
      acc = (acc * 31L + v) % P
      i += 1
    }
    acc
  }

  /** Index of the nearest centroid by squared L2 (ties → lowest index)
    * — identical to the declarative argmin-over-array-of-folds form,
    * which evaluates one interpreted zip_with fold PER centroid per row
    * (k·dims lambda dispatches; the 21s q52 hotspot at sf0.1).
    */
  def nearestCell(emb: ArrayData, centroids: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(emb.numElements(), cen.length)
      var d = 0.0
      var i = 0
      while (i < n) { val diff = emb.getDouble(i) - cen(i); d += diff * diff; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Distinct ordered k-gram shingles of a token array, joined with
    * single spaces, first-occurrence order — identical to
    * `array_distinct(transform(...array_join(slice(toks,i+1,k))...))`.
    */
  def shingleSet(tokens: ArrayData, k: Int): GenericArrayData = {
    val m = tokens.numElements()
    if (m < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= m - k) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new GenericArrayData(out)
  }
}

case class MinHashSigExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // The kernel yields null for an empty shingle array (there is no min
  // of zero hashes), so the expression is nullable even over a non-null
  // child — otherwise codegen marks the slot non-null while holding a
  // Java null and downstream consumers NPE.
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.minhashSig(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.HashKernels.minhashSig($c, $n);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class SimHash16Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "simhash16"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.simhash16(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.simhash16($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class Md5Slice60Expr(child: Expression, nibbleOffset: Int) extends UnaryExpression {
  require(nibbleOffset >= 0 && nibbleOffset <= 17, "md5 has 32 hex digits; offset+15 must fit")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_slice60"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.md5Slice60(input.asInstanceOf[UTF8String], nibbleOffset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.md5Slice60($c, $nibbleOffset)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class ShingleSetExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.shingleSet(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.shingleSet($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class DotProductExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // mismatched lengths / null elements
  override def prettyName: String = "dot_product"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double r = graft.expressions.HashKernels.dot($a, $b);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
    """)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class WinnowExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.winnow(input.asInstanceOf[ArrayData], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.winnow($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class LangScoresExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lang_scores"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.langScores(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.langScores($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class RollingHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // empty array / null tokens
  override def prettyName: String = "rolling_hash"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.rollingHash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long r = graft.expressions.HashKernels.rollingHash($c);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

// centroids as IndexedSeq, not Array: an Array parameter gives the case
// class identity-based equals/hashCode, so two nodes built from
// content-equal centroid matrices would never canonicalize together and
// Catalyst's subexpression/subplan reuse would silently miss.
case class NearestCellExpr(child: Expression, centroids: IndexedSeq[IndexedSeq[Double]]) extends UnaryExpression {
  private lazy val centroidArr: Array[Array[Double]] = centroids.map(_.toArray).toArray
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.nearestCell(input.asInstanceOf[ArrayData], centroidArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroidArr, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.nearestCell($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Column-level API for the kernel expressions. */
object TextHashExprs {
  def minhashSig(shingles: Column, n: Int): Column =
    GraftSqlBridge.column(MinHashSigExpr(GraftSqlBridge.expression(shingles), n))
  def simhash16(tokens: Column): Column =
    GraftSqlBridge.column(SimHash16Expr(GraftSqlBridge.expression(tokens)))
  def simhash64(tokens: Column): Column =
    GraftSqlBridge.column(SimHash64Expr(GraftSqlBridge.expression(tokens)))
  def md5Slice60(s: Column, nibbleOffset: Int): Column =
    GraftSqlBridge.column(Md5Slice60Expr(GraftSqlBridge.expression(s), nibbleOffset))
  def shingleSet(tokens: Column, k: Int): Column =
    GraftSqlBridge.column(ShingleSetExpr(GraftSqlBridge.expression(tokens), k))
  def winnow(tokens: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowExpr(GraftSqlBridge.expression(tokens), k, w))
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  def langScores(tokens: Column): Column =
    GraftSqlBridge.column(LangScoresExpr(GraftSqlBridge.expression(tokens)))
  def rollingHash(tokens: Column): Column =
    GraftSqlBridge.column(RollingHashExpr(GraftSqlBridge.expression(tokens)))
  def nearestCell(emb: Column, centroids: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(
      NearestCellExpr(GraftSqlBridge.expression(emb), centroids.map(_.toIndexedSeq).toIndexedSeq)
    )
}
