package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot paths.
  *
  * The higher-order-function formulations (`aggregate`/`zip_with`/
  * `transform`) are interpreted per element — fine for plumbing, ruinous in
  * an O(pairs) similarity join. These expressions evaluate as tight Java
  * loops (DotProduct additionally generates code into the whole-stage-codegen
  * pipeline) while producing bit-identical results to the HOF versions they
  * replace, so DuckDB-oracle parity is preserved.
  */

/** Left-to-right dot product over two array<double> columns — identical
  * accumulation order to `aggregate(zip_with(a, b, _*_), 0.0, _+_)`.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature: sig[i] = min over shingles s of xxhash64(s, i) — the
  * native form of `transform(sequence(0,k-1), i -> array_min(transform(sh,
  * s -> xxhash64(s, i))))`, hashing each shingle once and updating all k
  * minima in a single pass (k× fewer UTF8 hashes than the HOF version).
  */
case class MinHashSignature(child: Expression, k: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // an empty shingle set has no signature — null even off a non-null child
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  /** whole-document signature — ONE body shared by the interpreted eval
    * and the generated code (the xxhash64 digests dominate; the codegen
    * win is staying a primitive-typed call inside the whole-stage
    * pipeline instead of a CodegenFallback's InternalRow + boxed eval)
    */
  def compute(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    if (m == 0) return null
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < m) {
      // xxhash64(s, i) == hash(i, IntegerType, hash(s, StringType, 42))
      val base = XxHash64Function.hash(arr.getUTF8String(j), StringType, 42L)
      var i = 0
      while (i < k) {
        val h = XxHash64Function.hash(i, IntegerType, base)
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $ref.compute($c);
      |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** md5-prefix hashing shared by the locality-sensitive expressions.
  *
  * Why md5 and not xxhash64: the first 15 hex chars of the md5 digest parse
  * to the SAME 60-bit integer in any engine with an md5 function — DuckDB:
  * `('0x' || substr(md5(s), 1, 15))::BIGINT` — which makes every
  * hash-seeded operator (SimHash, sign-LSH buckets) fully reproducible by
  * the external SQL oracle, not just spec-tested. 60 bits (not 64) so the
  * value is always positive and fits a signed BIGINT in both engines.
  */
object Md5Util {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** value of the first 15 hex chars of md5(bytes): 7 full bytes + the high
    * nibble of byte 7 — identical to parseLong(hex.substring(0,15), 16).
    */
  def hash60(bytes: Array[Byte]): Long = {
    val md = tl.get(); md.reset()
    fold60(md.digest(bytes))
  }

  def hash60(s: UTF8String): Long = hash60(s.getBytes)

  /** hash60 of bytes[from, from+len) ++ suffix without concatenating —
    * the zero-allocation per-token path of [[ClassifierMicroSum]].
    */
  def hash60(bytes: Array[Byte], from: Int, len: Int, suffix: Array[Byte]): Long = {
    val md = tl.get(); md.reset()
    md.update(bytes, from, len)
    md.update(suffix)
    fold60(md.digest())
  }

  private def fold60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) & 0xF0L) >> 4)
  }
}

/** SimHash: 60-bit fingerprint where bit j is the sign of the ±1 votes of
  * bit j of each token's 60-bit md5 hash — one digest per token, native
  * vote loop. Oracle-reproducible (see Md5Util).
  */
case class SimHash64(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  /** one md5 digest per token + the vote fold — shared by the
    * interpreted eval and the generated primitive-typed call */
  def compute(arr: ArrayData): Long = {
    val m = arr.numElements()
    val votes = new Array[Int](60)
    var t = 0
    while (t < m) {
      val h = Md5Util.hash60(arr.getUTF8String(t))
      var j = 0
      while (j < 60) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var res = 0L
    var j = 59
    while (j >= 0) {
      res = (res << 1) | (if (votes(j) > 0) 1L else 0L)
      j -= 1
    }
    res
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sign-LSH bucket id over an array<double> vector: bit p of the bucket is
  * the sign of the dot product with pseudo-random hyperplane p, whose
  * components derive from md5("p_d") (Md5Util.hash60 % 10000 / 10000 - 0.5,
  * a value in [-0.5, 0.5)). The weight matrix is computed once per
  * (executor, dimension) and cached — the previous higher-order-function
  * formulation re-derived every component per row per plane (two xxhash64
  * expression-tree evaluations each), the dominant cost of the LSH paths.
  * Dot products accumulate left-to-right: bit-identical to
  * `list_dot_product` in the DuckDB oracle.
  */
case class SignLshBucket(child: Expression, planes: Int, offset: Int = 0)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sign_lsh"

  @transient private lazy val weightCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]()

  // `offset` shifts the global plane index: independent LSH tables reuse the
  // same derivation with offset = tableNo * planes (multi-table LSH).
  private def weights(dims: Int): Array[Array[Double]] =
    weightCache.computeIfAbsent(dims, _ => {
      Array.tabulate(planes, dims) { (p, d) =>
        val h = Md5Util.hash60(s"${offset + p}_${d}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (h % 10000L).toDouble / 10000.0 - 0.5
      }
    })

  /** per-plane dot + sign fold against the cached weight matrix — shared
    * by the interpreted eval and the generated primitive-typed call */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val w = weights(n)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val wp = w(p)
      var dot = 0.0
      var d = 0
      while (d < n) { dot += arr.getDouble(d) * wp(d); d += 1 }
      bucket = (bucket << 1) | (if (dot >= 0) 1L else 0L)
      p += 1
    }
    bucket
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signLsh", this, classOf[SignLshBucket].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Johnson–Lindenstrauss random projection of an array<double> vector to
  * `k` dimensions: component j is the dot product with pseudo-random plane
  * j — the SAME md5-derived plane family the sign-LSH uses
  * (Md5Util.hash60("p_d") % 10000 / 10000 - 0.5), so the projection is
  * deterministic across runs/engines and oracle-reproducible in DuckDB.
  * Components are the raw dot products; callers apply the sqrt(12/k)
  * norm-preserving scale where they need it (Var[U(-0.5,0.5)] = 1/12).
  * Weights are computed once per (instance, dimension) and cached; dot
  * products accumulate left-to-right, bit-identical to `list_dot_product`.
  */
case class RandomProjection(child: Expression, k: Int, offset: Int = 0)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_random_projection"

  @transient private lazy val weightCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]()

  private def weights(dims: Int): Array[Array[Double]] =
    weightCache.computeIfAbsent(dims, _ => {
      Array.tabulate(k, dims) { (p, d) =>
        val h = Md5Util.hash60(s"${offset + p}_${d}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (h % 10000L).toDouble / 10000.0 - 0.5
      }
    })

  /** the k projected dot products — shared by the interpreted eval and
    * the generated primitive-typed call */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val w = weights(n)
    val out = new Array[Any](k)
    var p = 0
    while (p < k) {
      val wp = w(p)
      var dot = 0.0
      var d = 0
      while (d < n) { dot += arr.getDouble(d) * wp(d); d += 1 }
      out(p) = dot
      p += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("randProj", this, classOf[RandomProjection].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word n-gram shingles over a token array: shingle i = tokens[i..i+n-1]
  * joined by a single space; if fewer than n tokens, one shingle of all
  * tokens. Distinct, order-preserving on first occurrence — identical to the
  * HOF `transform(sequence, i -> concat_ws(" ", slice(...)))` +
  * `array_distinct` chain it replaces, evaluated as one pass.
  */
case class NgramShingles(child: Expression, n: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  /** distinct first-occurrence shingles — shared by the interpreted eval
    * and the generated primitive-typed call */
  def compute(toks: ArrayData): ArrayData = {
    val m = toks.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (m < n) {
      val parts = new Array[UTF8String](m)
      var i = 0
      while (i < m) { parts(i) = toks.getUTF8String(i); i += 1 }
      out.add(UTF8String.concatWs(UTF8String.fromString(" "), parts: _*))
    } else {
      var i = 0
      while (i <= m - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        out.add(UTF8String.concatWs(UTF8String.fromString(" "), parts: _*))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this, classOf[NgramShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fraction of positions where two equal-length long arrays agree — the
  * signature-similarity estimate used to prefilter MinHash candidate pairs
  * before the exact (expensive) shingle-set Jaccard.
  */
case class SigMatchFraction(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sigmatch"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) eq += 1; i += 1 }
    eq.toDouble / n
  }

  // the whole comparison inlines — pure generated Java, no helper object
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val eq = ctx.freshName("eq")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $eq = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $eq++;
         |}
         |${ev.value} = $n == 0 ? 0.0 : (double) $eq / $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sign-bit packing of an array<double> into 64-bit words — bit i of word
  * w is set iff v[64·w + i] > 0. The 32× compressed binary embedding the
  * Hamming serving path ships instead of floats: a 64-dim vector becomes
  * ONE long. Semantics are pure sign structure, so an external engine
  * verifies distances from the sign definition without reproducing the
  * packing.
  */
case class SignPack(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_signpack"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val words = new Array[Long]((n + 63) / 64)
    var i = 0
    while (i < n) {
      if (v.getDouble(i) > 0) words(i / 64) |= (1L << (i % 64))
      i += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val words = ctx.freshName("words")
      val i = ctx.freshName("i")
      s"""
         |int $n = $v.numElements();
         |long[] $words = new long[($n + 63) / 64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.getDouble($i) > 0) $words[$i / 64] |= (1L << ($i % 64));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hamming distance between two sign-packed word arrays ([[SignPack]]) —
  * popcount of XOR per word, summed, as a tight codegen'd loop: the
  * O(pairs) hot path of binary-embedding search, 64 dimensions per
  * XOR+POPCNT instruction pair.
  */
case class HammingDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hamming"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column wrappers + SQL registration. */
/** Winnowed rolling-hash fingerprints (MOSS winnowing) — native single pass:
  * positional token k-gram md5-hash60s, sliding-window minima, distinct in
  * first-occurrence order. The higher-order-function formulation
  * (transform + slice + md5 per gram) interprets every lambda per element —
  * ~50× slower on long documents; this runs one digest per gram in a tight
  * loop. Bit-identical to the DuckDB oracle's
  * `list_min(hashes[j+1:j+w])` over `('0x'||substr(md5(gram),1,15))::BIGINT`.
  *
  * Documents shorter than k tokens emit NO fingerprints (canonical
  * winnowing: there is no complete k-gram to hash) — without this every
  * empty/whitespace-only document would carry the identical md5("")
  * fingerprint and pair with every other degenerate document whenever a
  * caller lowers `minShared` to 1.
  */
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  private val emptyResult = new GenericArrayData(Array.empty[Any])

  /** gram hashes + sliding minima + first-occurrence dedup — shared by
    * the interpreted eval and the generated primitive-typed call */
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < k) return emptyResult
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks.getUTF8String(j).toString)
        j += 1
      }
      hashes(i) = Md5Util.hash60(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    val nWins = math.max(nGrams - window, 0) + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var w = 0
    while (w < nWins) {
      var m = Long.MaxValue
      var j = w
      val end = math.min(w + window, nGrams)
      while (j < end) { if (hashes(j) < m) m = hashes(j); j += 1 }
      seen.add(m)
      w += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) { out(x) = it.next().longValue(); x += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Excess-repetition fraction of the most frequent FULL positional token
  * n-gram: (maxCount − 1) / (nGrams − 1) — the Gopher-style top-n-gram
  * signal, normalized so a repetition-free document scores exactly 0.0 at
  * EVERY length (the raw maxCount/nGrams fraction has a 1/nGrams floor that
  * makes short repetition-free documents fail any fixed threshold) and a
  * fully degenerate document scores 1.0. Documents with fewer than two full
  * n-grams score 0.0 (a single gram cannot repeat). Native hash-count loop;
  * the DuckDB oracle reproduces it with list_max over per-distinct-gram
  * counts.
  */
case class TopNgramFraction(child: Expression, n: Int)
  extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_top_ngram_frac"

  /** the gram-count pass — shared by the interpreted eval and the
    * generated primitive-typed call */
  def compute(toks: ArrayData): Double = {
    val m = toks.numElements()
    val nGrams = m - n + 1
    if (nGrams < 2) return 0.0
    val counts = new java.util.HashMap[String, Integer]()
    val sb = new java.lang.StringBuilder
    var best = 0
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(toks.getUTF8String(j).toString)
        j += 1
      }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    (best - 1).toDouble / (nGrams - 1).toDouble
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topNgram", this, classOf[TopNgramFraction].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared byte-walk over normalized tokens: the single-pass engine behind
  * [[ClassifierMicroSum]] / [[QualityScoreRaw]] / [[TokenCountExpr]].
  *
  * `TextAnalysis.normalize` is lower → strip [^a-z0-9]+ to spaces →
  * collapse → trim, and its tokens are therefore exactly the maximal runs
  * of [a-z0-9] BYTES of the lowercased string: every non-token character
  * (including each byte of a multi-byte UTF-8 sequence) is a separator,
  * and separator runs collapse. Walking the lowercased bytes yields the
  * identical token stream with zero regex work and zero allocation — the
  * higher-order-function formulation (split + filter + aggregate with
  * per-element lambda interpretation plus an md5 Expression per token)
  * measured ~4-10× slower on the documents corpus.
  */
private object TokenWalk {
  @inline def isTok(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** visit(start, end) for each token run in `lower`; returns run count */
  @inline def foreachRun(lower: Array[Byte])(visit: (Int, Int) => Unit): Int = {
    var i = 0
    var runs = 0
    val n = lower.length
    while (i < n) {
      if (isTok(lower(i))) {
        val start = i
        while (i < n && isTok(lower(i))) i += 1
        visit(start, i)
        runs += 1
      } else i += 1
    }
    runs
  }
}

/** Hashing-trick linear-classifier margin sum — native single pass. Exactly
  * `aggregate(filter(tokens(text), length(t) > 0), 0L,
  * (acc, t) => acc + hash60(t || salt) % 2000001 - 1000000)` (see
  * TextAnalysis.classifierMicroSum), evaluated as one walk over the
  * lowercased bytes with one md5 digest per token — no per-token lambda
  * interpretation, no string allocation. Bit-identical to the DuckDB
  * oracle's `sum(('0x'||substr(md5(tok||salt),1,15))::BIGINT % 2000001 -
  * 1000000)` over the same token stream.
  */
case class ClassifierMicroSum(child: Expression, salt: String)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_micro_sum"

  private val saltBytes = salt.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** the whole-document walk — ONE body shared verbatim by the
    * interpreted eval and the generated code (the md5 digest per token
    * dominates; the codegen win is skipping the per-row interpreted
    * dispatch/boxing, SignPack's tight-loop discipline)
    */
  def compute(s: UTF8String): Long = {
    val lower = s.toLowerCase.getBytes
    var sum = 0L
    TokenWalk.foreachRun(lower) { (start, end) =>
      sum += Md5Util.hash60(lower, start, end - start, saltBytes) % 2000001L - 1000000L
    }
    sum
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // unlike a CodegenFallback (which materializes an InternalRow and
    // boxes through Object eval), this stays a primitive-typed call
    // inside the whole-stage pipeline
    val ref = ctx.addReferenceObj("microSum", this, classOf[ClassifierMicroSum].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Normalized-token count — native twin of `TextAnalysis.tokenCount`
  * (`when(length(normalize(text)) === 0, 0).otherwise(size(tokens(text)))`):
  * the number of [a-z0-9] runs of the lowercased bytes, 0 for empty/blank.
  */
case class TokenCountExpr(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"

  override def nullSafeEval(input: Any): Any =
    TokenWalk.foreachRun(input.asInstanceOf[UTF8String].toLowerCase.getBytes)((_, _) => ())

  // the [a-z0-9] run count inlines fully — no digest, no helper object:
  // pure generated Java inside the whole-stage pipeline
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |byte[] $b = $c.toLowerCase().getBytes();
         |int $n = 0;
         |int $i = 0;
         |while ($i < $b.length) {
         |  if (($b[$i] >= 'a' && $b[$i] <= 'z') || ($b[$i] >= '0' && $b[$i] <= '9')) {
         |    $n++;
         |    do { $i++; } while ($i < $b.length &&
         |      (($b[$i] >= 'a' && $b[$i] <= 'z') || ($b[$i] >= '0' && $b[$i] <= '9')));
         |  } else $i++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Document quality score — native twin of `TextAnalysis.qualityScoreRaw`
  * (0.4·length-score + 0.3·stopword-ratio-score + 0.3·(1 − punct-ratio)),
  * with every double formed in the SAME IEEE operation order as the Column
  * formulation so results are bit-identical (QualityParitySpec pins this
  * against the Column version on edge cases, and the DuckDB oracle gate
  * pins it on the corpus):
  *
  *   - nChars    = Spark `length(text)` = code points = UTF-8 lead bytes
  *   - ntok      = [a-z0-9] runs of the lowercased bytes
  *   - nstop     = runs equal to one of the five 'en' stopwords
  *   - npunct    = code points NOT in [a-zA-Z0-9\s] of the ORIGINAL text —
  *                 any single-byte char outside the class, plus every
  *                 multi-byte code point (all non-ASCII is outside an
  *                 ASCII class; Java regex \s is ASCII-only by default)
  */
case class QualityScoreRaw(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_quality_raw"

  // the 'en' stopword list of TextAnalysis.stopwords, as bytes
  private val stops: Array[Array[Byte]] =
    Array("the", "and", "of", "to", "a").map(_.getBytes("US-ASCII"))

  private def isStop(b: Array[Byte], start: Int, end: Int): Boolean = {
    val len = end - start
    var s = 0
    while (s < stops.length) {
      val w = stops(s)
      if (w.length == len) {
        var i = 0
        while (i < len && b(start + i) == w(i)) i += 1
        if (i == len) return true
      }
      s += 1
    }
    false
  }

  /** both byte walks + the fixed-order formula — ONE body shared by the
    * interpreted eval and the generated code (SignPack's tight-loop
    * discipline; a primitive-typed call, no InternalRow materialization)
    */
  def compute(str: UTF8String): Double = {
    val raw = str.getBytes
    // one pass over the RAW bytes: code points + punctuation class
    var nChars = 0
    var npunct = 0
    var i = 0
    while (i < raw.length) {
      val b = raw(i)
      if ((b & 0xC0) != 0x80) { // lead byte = one code point
        nChars += 1
        if (b < 0) npunct += 1 // multi-byte code point: outside the class
        else {
          val ok = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
            (b >= '0' && b <= '9') || b == ' ' || b == '\t' || b == '\n' ||
            b == 0x0B || b == '\f' || b == '\r'
          if (!ok) npunct += 1
        }
      }
      i += 1
    }
    // one pass over the LOWERCASED bytes: tokens + stopword hits
    val lower = str.toLowerCase.getBytes
    var nstop = 0
    val ntok = TokenWalk.foreachRun(lower) { (start, end) =>
      if (isStop(lower, start, end)) nstop += 1
    }
    // EXACT operation order of the Column formulation
    val lenScore = math.min(nChars.toDouble / 500.0, 1.0)
    val stopRatio =
      if (ntok == 0) 0.0
      else math.min(nstop.toDouble * 5.0 / ntok.toDouble, 1.0)
    val punctRatio =
      if (nChars == 0) 1.0 else npunct.toDouble / nChars.toDouble
    lenScore * 0.4 + stopRatio * 0.3 + (1.0 - punctRatio) * 0.3
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quality", this, classOf[QualityScoreRaw].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** cast-or-NULL with the right engine per input type (reference getint/
  * getfloat/... parse-or-default, pygrametl/__init__.py:190-337): string
  * inputs take the LEGACY-mode Cast (NULL through the non-throwing parse
  * path — the measured hot path, no per-row exceptions); any other input
  * takes TRY mode so numeric narrowing that overflows yields NULL (the
  * default, not a wrapped value). Resolved lazily (RuntimeReplaceable) —
  * the choice needs the child's resolved type.
  */
/** Threshold levenshtein with common-affix stripping — value-identical to
  * Spark's `Levenshtein(left, right, Some(bound))` (the exact distance when
  * ≤ bound, −1 above it), but engineered for the record-linkage hot loop
  * where candidates share long prefixes/suffixes (blocked entity names:
  * "customer 000000488" vs "customer 000000483" differ in ONE char):
  *
  *   1. ASCII fast path strips the common prefix and suffix in two raw
  *      byte scans — edit distance is invariant under shared affixes —
  *      leaving cores of a few characters;
  *   2. the cores take a full DP on thread-local buffers (no per-call
  *      allocation; cores are tiny by construction of the strip);
  *   3. non-ASCII inputs and pathological cores delegate to
  *      `UTF8String.levenshteinDistance(other, bound)` — Spark's own —
  *      so every path returns the identical value.
  *
  * Measured ~5× over the banded builtin on the linkage candidate stream
  * (the DP shrinks from bound×len to core²≈4–16 cells per pair).
  */
case class LevenshteinStripped(first: Expression, second: Expression,
                               third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lev_stripped"

  @transient private lazy val dpBuf = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](128)
  }

  def compute(a: UTF8String, b: UTF8String, k: Int): Int = {
    if (k < 0) return -1
    val na = a.numBytes
    val nb = b.numBytes
    // ASCII iff bytes == chars; multi-byte input takes Spark's own path
    if (na != a.numChars || nb != b.numChars)
      return a.levenshteinDistance(b, k)
    val ba = a.getBytes
    val bb = b.getBytes
    // strip common prefix
    var p = 0
    val pMax = math.min(na, nb)
    while (p < pMax && ba(p) == bb(p)) p += 1
    // strip common suffix of the remainders
    var s = 0
    val sMax = pMax - p
    while (s < sMax && ba(na - 1 - s) == bb(nb - 1 - s)) s += 1
    val n = na - p - s
    val m = nb - p - s
    if (math.abs(n - m) > k) return -1
    if (n == 0 || m == 0) { val d = math.max(n, m); return if (d <= k) d else -1 }
    if (math.min(n, m) >= 64) return a.levenshteinDistance(b, k)
    // full DP over the cores on a thread-local row buffer: prev/cur
    // interleaved in one array [0..m] — cores are tiny after the strip
    val buf = {
      val t = dpBuf.get()
      if (t.length >= m + 1) t
      else { val u = new Array[Int](m + 1); dpBuf.set(u); u }
    }
    var j = 0
    while (j <= m) { buf(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      var diag = buf(0) // d[i-1][j-1]
      buf(0) = i
      val ca = ba(p + i - 1)
      j = 1
      while (j <= m) {
        val up = buf(j) // d[i-1][j]
        val cost = if (ca == bb(p + j - 1)) 0 else 1
        var v = diag + cost
        val del = up + 1
        if (del < v) v = del
        val ins = buf(j - 1) + 1
        if (ins < v) v = ins
        buf(j) = v
        diag = up
        j += 1
      }
      i += 1
    }
    val d = buf(m)
    if (d <= k) d else -1
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("levStrip", this, classOf[LevenshteinStripped].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"${ev.value} = $ref.compute($a, $b, $c);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

case class SafeCast(child: Expression, targetType: DataType)
  extends UnaryExpression with RuntimeReplaceable {

  override def prettyName: String = "graft_safe_cast"

  override lazy val replacement: Expression = child.dataType match {
    case _: StringType => Cast(child, targetType, None, EvalMode.LEGACY)
    case _ => Cast(child, targetType, None, EvalMode.TRY)
  }

  override protected def withNewChildInternal(newChild: Expression): SafeCast =
    copy(child = newChild)
}

object NativeFunctions {
  import org.apache.spark.sql.graftbridge.Bridge
  private def col(e: Expression): Column = Bridge.column(e)
  private def expr(c: Column): Expression = Bridge.expression(c)

  /** inputs are cast to array<double> here — the expression itself assumes
    * its operand types (no ImplicitCastInputTypes: AbstractDataType is
    * private[sql])
    */
  def dot(a: Column, b: Column): Column =
    col(DotProduct(expr(a.cast("array<double>")), expr(b.cast("array<double>"))))
  def minhashSignature(shingles: Column, k: Int): Column = col(MinHashSignature(expr(shingles), k))
  def simhash64(tokens: Column): Column = col(SimHash64(expr(tokens)))
  def ngramShingles(tokens: Column, n: Int): Column = col(NgramShingles(expr(tokens), n))
  def sigMatchFraction(a: Column, b: Column): Column = col(SigMatchFraction(expr(a), expr(b)))
  def classifierMicroSum(text: Column, salt: String): Column =
    col(ClassifierMicroSum(expr(text.cast("string")), salt))
  def tokenCount(text: Column): Column = col(TokenCountExpr(expr(text.cast("string"))))
  def qualityScoreRaw(text: Column): Column = col(QualityScoreRaw(expr(text.cast("string"))))
  def signLshBucket(vec: Column, planes: Int, offset: Int = 0): Column =
    col(SignLshBucket(expr(vec.cast("array<double>")), planes, offset))
  def randomProjection(vec: Column, k: Int, offset: Int = 0): Column =
    col(RandomProjection(expr(vec.cast("array<double>")), k, offset))
  def winnowFingerprints(tokens: Column, k: Int, window: Int): Column =
    col(WinnowFingerprints(expr(tokens), k, window))
  def topNgramFraction(tokens: Column, n: Int): Column =
    col(TopNgramFraction(expr(tokens), n))
  def signPack(vec: Column): Column =
    col(SignPack(expr(vec.cast("array<double>"))))
  def hammingDistance(a: Column, b: Column): Column =
    col(HammingDistance(expr(a), expr(b)))
  def levenshteinStripped(a: Column, b: Column, bound: Column): Column =
    col(LevenshteinStripped(expr(a.cast("string")), expr(b.cast("string")),
      expr(bound.cast("int"))))

  /** expose every native expression as a SQL function — delegates to
    * [[GraftExtensions.register]], the full catalog (the
    * `spark.sql.extensions` startup path uses `class GraftExtensions`)
    */
  def register(spark: SparkSession): Unit = GraftExtensions.register(spark)
}
