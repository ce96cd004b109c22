package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Imperative Catalyst expression computing distinct hashed word-n-gram
  * shingles of a text in a single pass.
  *
  * Why not compose built-ins? The compositional form
  * (`transform(sequence(...), i -> concat_ws(' ', element_at(toks, i)...))`)
  * hits a Catalyst blind spot: `CollapseProject` inlines the tokenizer
  * into the higher-order-function lambda, where subexpression elimination
  * cannot reach, so the regexp split re-runs for every element access —
  * O(tokens x shingles) regexp work per document. This expression runs the
  * split once and hashes n-grams in one loop.
  *
  * Semantics are bit-identical to the compositional/oracle form:
  * tokens = split on `\s+` minus empties; shingles = space-joined n-grams
  * in order, string-distinct (first occurrence); hash = first 6 md5 bytes
  * as an unsigned 48-bit BIGINT (= `conv(substr(md5(s),1,12),16,10)`),
  * distinct again after hashing.
  */
case class HashedShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override protected def nullSafeEval(t: Any): Any = {
    val text = t.asInstanceOf[UTF8String].toString
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val seenGrams = new java.util.LinkedHashSet[String]()
    var i = 0
    val sb = new java.lang.StringBuilder()
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seenGrams.add(sb.toString)
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val it = seenGrams.iterator()
    while (it.hasNext) {
      val digest = md.digest(it.next().getBytes("UTF-8"))
      // first 12 hex chars = first 6 bytes, as unsigned 48-bit long
      var h = 0L
      var b = 0
      while (b < 6) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
      out.add(h)
    }
    val arr = new Array[Long](out.size)
    val oit = out.iterator()
    var k = 0
    while (oit.hasNext) { arr(k) = oit.next(); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** POSITIONAL hashed shingles: like [[HashedShinglesExpr]] but keeps
  * every window in start order (no dedup) — element i (0-based) is the
  * 48-bit hash of the n-gram starting at token i+1. The span-removal
  * operator needs window positions, and the compositional form
  * (`transform(sequence(...), i => md5(concat_ws(...)))`) is an
  * interpreted per-element lambda that measured ~6 us/window — 37 s per
  * evaluation at the 10x smoke scale — where this single pass is ~20x
  * cheaper and is evaluated once per branch.
  */
case class PositionalHashedShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "positional_hashed_shingles"

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override protected def nullSafeEval(t: Any): Any = {
    val text = t.asInstanceOf[UTF8String].toString
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    val sb = new java.lang.StringBuilder()
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val digest = md.digest(sb.toString.getBytes("UTF-8"))
      var h = 0L
      var b = 0
      while (b < 6) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 60-bit SimHash from a token-hash array, in one pass.
  *
  * Replaces 60 per-bit `aggregate` higher-order folds (each re-walking the
  * token array through an interpreted lambda) with a single loop
  * maintaining 60 counters. Bit j of the result is 1 iff the sum over
  * tokens of (bit j set ? +1 : -1) is positive — identical semantics to
  * the fold form and to the SQL oracle.
  */
case class SimHash60Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(a: Any): Any = {
    val hs = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    val counts = new Array[Int](60)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All 3-character windows of a string in ONE linear byte walk.
  *
  * Why not `substring(lt, i, 3)` exploded over positions? UTF8String's
  * by-character substring has to walk from byte 0 to find character i
  * (UTF-8 is variable-width), so extracting every window that way is
  * O(len) PER WINDOW — O(len^2) per document. Measured on sf0.1 docs
  * concatenated to 2x/4x/8x length: 5.9 s / 23 s / 88 s — a perfect
  * quadratic, and a scale-killer for real web documents (10-100 KB).
  * This expression computes the character start offsets once and wraps
  * each 3-char byte range without copying — O(len), any document size.
  *
  * Output order and content are identical to the substring form
  * (windows at char positions 1..n-2, by code point); `< 3` chars yields
  * an empty array (the explode then drops the doc, as before).
  */
case class CharTrigramsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "char_trigrams"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_trigrams needs a string column, got ${other.sql}")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val nb = bytes.length
    var nc = 0
    var i = 0
    while (i < nb) { nc += 1; i += UTF8String.numBytesForFirstByte(bytes(i)) }
    if (nc < 3) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](nc + 1)
    i = 0
    var c = 0
    while (i < nb) { offs(c) = i; c += 1; i += UTF8String.numBytesForFirstByte(bytes(i)) }
    offs(nc) = nb
    val out = new Array[Any](nc - 2)
    var j = 0
    while (j < nc - 2) {
      out(j) = UTF8String.fromBytes(bytes, offs(j), offs(j + 3) - offs(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def charTrigramWindows(text: Column): Column =
    column(CharTrigramsExpr(expression(text)))

  def hashedShingles(text: Column, n: Int): Column =
    column(HashedShinglesExpr(expression(text), n))

  def positionalHashedShingles(text: Column, n: Int): Column =
    column(PositionalHashedShinglesExpr(expression(text), n))

  def simhash60(tokenHashes: Column): Column =
    column(SimHash60Expr(expression(tokenHashes)))

  /** The custom functions' SQL builders, with argument validation —
    * shared by [[registerAll]] (per-session) and
    * [[graft.GraftExtensions]] (cluster-wide `spark.sql.extensions`), so
    * a wrong arity or a non-literal shingle size fails analysis with a
    * clear `AnalysisException` on BOTH paths instead of a
    * `ClassCastException`/`IndexOutOfBoundsException` at plan time.
    */
  def sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def analysisError(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        msg, None, None, None, None, Map.empty, Array.empty)
    def arity(name: String, es: Seq[Expression], n: Int): Seq[Expression] =
      if (es.length == n) es
      else analysisError(s"$name expects $n argument(s), got ${es.length}")
    def intLiteral(name: String, arg: String, e: Expression): Int = e match {
      case Literal(v: Int, _)   => v
      case Literal(v: Long, _)  => v.toInt
      case Literal(v: Short, _) => v.toInt
      case Literal(v: Byte, _)  => v.toInt
      case other => analysisError(
        s"$name: <$arg> must be an integer literal, got ${other.sql}")
    }
    Seq(
      "dot_product_d" -> { es: Seq[Expression] =>
        val a = arity("dot_product_d", es, 2); DotProductD(a(0), a(1))
      },
      "l2_norm_d" -> { es: Seq[Expression] =>
        L2NormD(arity("l2_norm_d", es, 1).head)
      },
      "hashed_shingles" -> { es: Seq[Expression] =>
        val a = arity("hashed_shingles", es, 2)
        HashedShinglesExpr(a.head, intLiteral("hashed_shingles", "n", a(1)))
      },
      "positional_hashed_shingles" -> { es: Seq[Expression] =>
        val a = arity("positional_hashed_shingles", es, 2)
        PositionalHashedShinglesExpr(a.head,
          intLiteral("positional_hashed_shingles", "n", a(1)))
      },
      "simhash60" -> { es: Seq[Expression] =>
        SimHash60Expr(arity("simhash60", es, 1).head)
      },
      "char_trigrams" -> { es: Seq[Expression] =>
        CharTrigramsExpr(arity("char_trigrams", es, 1).head)
      })
  }

  /** Make every custom graft expression callable from `spark.sql(...)`:
    * `dot_product_d(a, b)`, `l2_norm_d(a)`, `hashed_shingles(text, n)`,
    * `simhash60(hashes)`.
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.registerFunction
    sqlBuilders.foreach { case (name, b) => registerFunction(spark, name, b) }
  }
}
