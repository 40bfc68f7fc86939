package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot inner loops.
  *
  * Spark's higher-order functions (transform/aggregate/zip_with) evaluate
  * their lambdas interpreted, one function call per element — for the
  * signature computations (64 bits × |tokens|, k hashes × |shingles|,
  * 64-dim dot products × |pairs|) that interpretation dominates the query.
  * These expressions do the same work in one tight JVM loop per row
  * (CodegenFallback: one virtual call per row, branch-free inner loops),
  * which benchmarked 5-10× faster at sf0.1 and scales the same way on a
  * cluster — per-row cost, no extra shuffles.
  */

/** 60-bit SimHash of an array<string>: bit b of the result is set iff the
  * sum over elements of (bit b of the element's hash ? +1 : −1) is positive.
  * The element hash is [[PolyHash.h60]] (two independent 30-bit polynomial
  * hashes), so the signature is reproducible in the DuckDB oracle with plain
  * BIGINT arithmetic — xxhash64 would make the query uncheckable
  * cross-engine.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = super.checkInputDataTypes()

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counters = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = PolyHash.h60(arr.getUTF8String(i).toString)
        var b = 0
        while (b < 60) {
          counters(b) += ((((h >>> b) & 1L) << 1) - 1).toInt
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (counters(b) > 0) sig |= (1L << b); b += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): SimHash60 = copy(child = c)
}

/** MinHash signature (array<long> of length k) of an array<string> shingle
  * set: one [[PolyHash.h1]] per element, then k affine variants
  * g_i(x) = (a_i·h(x) + b_i) mod 1e9+7 with fixed splitmix64-derived
  * constants — the standard single-hash minwise family, kept inside BIGINT
  * modular arithmetic so the DuckDB oracle computes the identical signature
  * (`list_min(list_transform(hs, h -> (a*h + b) % 1000000007))`).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val (as, bs): (Array[Long], Array[Long]) =
    PolyHash.minhashAffine(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = PolyHash.h1(arr.getUTF8String(i).toString)
        var k = 0
        while (k < numHashes) {
          val g = (as(k) * h + bs(k)) % PolyHash.P1
          if (g < mins(k)) mins(k) = g
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** Distinct word n-gram shingles of an array<string>, single-space joined —
  * one pass, one output string per window, deduped with a hash set. The
  * transform+slice+array_join HOF composition allocates an interpreted
  * lambda frame and an array slice per window.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val nWindows = math.max(len - (n - 1), math.min(len, 1))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < nWindows) {
      val w = new Array[UTF8String](math.min(n, len - i))
      var j = 0
      while (j < w.length) { w(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, w: _*))
      i += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** ALL word n-grams of an array<string>, multiplicity kept and document
  * order preserved (contrast [[WordShingles]], which dedupes for set
  * signatures and pads short docs): exactly the `len − n + 1` space-joined
  * windows, empty when the doc is shorter than n. The counting kernel of
  * [[graft.llm.NgramLm]] — the interpreted transform/slice/array_join
  * equivalent measured 4× slower at sf0.1.
  */
case class WordGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nWindows = math.max(0, arr.numElements() - (n - 1))
    val out = new Array[AnyRef](nWindows)
    var i = 0
    while (i < nWindows) {
      val w = new Array[UTF8String](n)
      var j = 0
      while (j < n) { w(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, w: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WordGrams = copy(child = c)
}

/** Per-document Gopher repetition char counts (Rae et al. 2021, A1.1) in a
  * SINGLE pass per order over the token array — the statistic is entirely
  * doc-local, so computing it inside a projection removes the explode and
  * both keyed exchanges the relational formulation pays (at 100 TB those
  * exchanges carry ~4 gram rows per token through the shuffle; this carries
  * nothing). Output is `array<long>` laid out as
  * `topOrders.map(topChars) ++ dupOrders.map(dupChars)` where
  *
  *  - `topChars(k)` = cnt × numChars(gram) of the most frequent word
  *    `k`-gram, the argmax on (count, then BINARY-largest gram) — the same
  *    tie-break `max(struct(cnt, gram))` used relationally, since both
  *    compare [[UTF8String]]s byte-wise;
  *  - `dupChars(k)` = Σ over `k`-grams with count ≥ 2 of cnt × numChars.
  *
  * Gram bytes are built with the same `UTF8String.concatWs(" ")` as
  * [[WordGrams]], so counts, lengths, and tie-breaks are bit-identical to
  * the exploded form (and to the DuckDB list-slicing oracle). Orders with
  * no grams (doc shorter than k tokens) contribute 0. Per-doc state is one
  * hash map of the doc's distinct grams — bounded by document length.
  */
case class GramRepetition(child: Expression, topOrders: Seq[Int],
                          dupOrders: Seq[Int])
    extends UnaryExpression with CodegenFallback {
  require(topOrders.forall(_ >= 1) && dupOrders.forall(_ >= 1))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Long](topOrders.length + dupOrders.length)
    var oi = 0
    topOrders.foreach { k => out(oi) = stat(toks, k, top = true); oi += 1 }
    dupOrders.foreach { k => out(oi) = stat(toks, k, top = false); oi += 1 }
    new GenericArrayData(out)
  }

  private def stat(toks: Array[UTF8String], k: Int, top: Boolean): Long = {
    val nW = toks.length - (k - 1)
    if (nW <= 0) return 0L
    val m = new java.util.HashMap[UTF8String, java.lang.Long](nW * 2)
    val w = new Array[UTF8String](k)
    var i = 0
    while (i < nW) {
      var j = 0
      while (j < k) { w(j) = toks(i + j); j += 1 }
      val g = UTF8String.concatWs(sep, w.toIndexedSeq: _*)
      val prev = m.get(g)
      m.put(g, if (prev == null) 1L else prev.longValue + 1L)
      i += 1
    }
    val it = m.entrySet().iterator()
    if (top) {
      var bestCnt = 0L
      var bestGram: UTF8String = null
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.longValue
        if (c > bestCnt ||
            (c == bestCnt && e.getKey.compareTo(bestGram) > 0)) {
          bestCnt = c; bestGram = e.getKey
        }
      }
      bestCnt * bestGram.numChars()
    } else {
      var s = 0L
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.longValue
        if (c >= 2L) s += c * e.getKey.numChars()
      }
      s
    }
  }

  override protected def withNewChildInternal(c: Expression): GramRepetition =
    copy(child = c)
}

/** Random-sign (Johnson–Lindenstrauss / very sparse random projection,
  * Achlioptas 2003 with ±1 signs) projection of an array<double> vector to
  * `outDim` dimensions: `out[j] = Σ_k sign(j,k) · round(v[k]·1e6)`, the
  * sign drawn from the parity bit of [[graft.llm.Corpus.mix32L]] over
  * `j·len + k` — a seedless deterministic scatter replayable as plain
  * BIGINT arithmetic in SQL. Terms are rounded half-away to integer
  * micro-units BEFORE summing, so the accumulation is integer and
  * order-free (bit-reproducible in any engine); callers divide by 1e6
  * downstream. One row-local O(len·outDim) pass, zero shuffle — the cheap
  * dimensionality-reduction front-end for ANN indexing and dedup blocking.
  */
case class RandomSignProject(child: Expression, outDim: Int)
    extends UnaryExpression with CodegenFallback {
  require(outDim >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](outDim)
    var k = 0
    while (k < n) {
      if (!arr.isNullAt(k)) {
        val v = arr.getDouble(k)
        val x = v * 1000000.0
        val t = if (x >= 0) math.floor(x + 0.5).toLong
                else -math.floor(-x + 0.5).toLong
        var j = 0
        while (j < outDim) {
          if ((graft.llm.Corpus.mix32L(j.toLong * n + k) & 1L) == 0L) out(j) += t
          else out(j) -= t
          j += 1
        }
      }
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): RandomSignProject =
    copy(child = c)
}

/** Doc-local Shannon-entropy accumulators of an array<string> of tokens:
  * `array<long>` of `[Σ_c round(c·ln(c)/ln(2)·1e6), n_distinct]` where the
  * sum runs over the counts `c` of the doc's distinct tokens, each term
  * rounded half-up to integer micro-bits BEFORE summing — the summation is
  * integer and therefore order-free, so the statistic is bit-reproducible
  * in any engine (the same micro-unit trick as the LM scorer; the final
  * `H = log2(n) − S/(n·1e6)` is per-row arithmetic downstream). ln-ratio
  * (`ln(c)/ln(2)`) rather than a log2 builtin, mirroring the DuckDB
  * replay's exact formulation. One hash-map pass per document; entropy is
  * doc-local, so the whole operator is a shuffle-free projection.
  */
case class TokenEntropyMicro(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val prev = m.get(t)
        m.put(t, if (prev == null) 1L else prev.longValue + 1L)
      }
      i += 1
    }
    var s = 0L
    val ln2 = math.log(2.0)
    val it = m.values().iterator()
    while (it.hasNext) {
      val c = it.next().longValue
      if (c >= 2L)
        s += math.floor(c * (math.log(c.toDouble) / ln2) * 1000000.0 + 0.5).toLong
    }
    new GenericArrayData(Array(s, m.size.toLong))
  }

  override protected def withNewChildInternal(c: Expression): TokenEntropyMicro =
    copy(child = c)
}

/** Winnowing fingerprints (Schleimer et al. 2003, the MOSS algorithm) of an
  * array<string> of tokens: the distinct minima of [[PolyHash.h1]] word
  * `k`-gram hashes over every sliding window of `w` consecutive grams,
  * returned ASCENDING. Guarantees of the scheme: any shared token run of
  * length ≥ k + w − 1 between two documents yields at least one shared
  * fingerprint, and the fingerprint density is ~2/(w+1) — local
  * fingerprinting for partial-overlap detection, where minhash (whole-doc
  * set similarity) and simhash (global bit vote) both dilute a copied
  * passage below threshold. One O(n) pass per document (monotonic-deque
  * sliding min, gram hashes computed incrementally without materializing
  * gram strings); documents shorter than k tokens yield an empty array.
  * PolyHash keeps the fingerprints replayable in the DuckDB oracle with
  * plain BIGINT arithmetic.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = n - (k - 1)
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    // h1 of the space-joined gram, computed by folding token code points
    // with an explicit separator (identical to hashing the joined string)
    val hs = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) {
        if (j > 0) h = (h * PolyHash.B1 + 32L) % PolyHash.P1
        val s = toks(i + j)
        var c = 0
        while (c < s.length) {
          val cp = s.codePointAt(c)
          h = (h * PolyHash.B1 + cp) % PolyHash.P1
          c += Character.charCount(cp)
        }
        j += 1
      }
      hs(i) = h
      i += 1
    }
    val starts = math.max(m - w, 0) + 1
    val sel = new java.util.TreeSet[java.lang.Long]()
    val dq = new java.util.ArrayDeque[Int]()
    var p = 0
    while (p < math.min(w, m)) { // first window (may be short when m < w)
      while (!dq.isEmpty && hs(dq.peekLast()) >= hs(p)) dq.pollLast()
      dq.addLast(p)
      p += 1
    }
    sel.add(hs(dq.peekFirst()))
    var s0 = 1
    while (s0 < starts) {
      if (dq.peekFirst() < s0) dq.pollFirst()
      val end = s0 + w - 1 // < m because s0 <= m - w here
      while (!dq.isEmpty && hs(dq.peekLast()) >= hs(end)) dq.pollLast()
      dq.addLast(end)
      sel.add(hs(dq.peekFirst()))
      s0 += 1
    }
    val out = new Array[Long](sel.size())
    val it = sel.iterator()
    var q = 0
    while (it.hasNext) { out(q) = it.next(); q += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

/** Random-hyperplane LSH bucket key of an array<double> vector: bit p of
  * the result is the sign of the dot product with pseudo-random plane p,
  * whose components ([[PolyHash.planeComponent]]) are splitmix64-derived in
  * [-1, 1). Deterministic across runs and engines — the oracle embeds the
  * same components as double literals and replays the same sequential
  * left-to-right accumulation, so the sign decisions are bitwise identical.
  * One tight O(nBits·dim) loop per row.
  */
case class HyperplaneLshKey(child: Expression, nBits: Int)
    extends UnaryExpression with CodegenFallback {
  require(nBits >= 1 && nBits <= 63)
  override def dataType: DataType = LongType

  // Plane table memoized per expression instance, grown to the widest vector
  // seen (publication race is benign: the table is deterministic).
  @volatile private var comps: Array[Array[Double]] = Array.empty

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    if (comps.isEmpty || comps(0).length < dim) comps = PolyHash.planes(nBits, dim)
    val pl = comps
    var key = 0L
    var p = 0
    while (p < nBits) {
      val row = pl(p)
      var acc = 0.0
      var d = 0
      while (d < dim) { acc += v.getDouble(d) * row(d); d += 1 }
      if (acc > 0) key |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(key)
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneLshKey = copy(child = c)
}

/** Dot product of two array<double> columns, summed left-to-right (within
  * 1 ulp of the DuckDB oracle's pairwise-accumulated list_inner_product —
  * rounded results agree; pinned by CrossEngineSpec). Implements doGenCode so
  * the loop is inlined into whole-stage codegen — similarity scans stay one
  * fused pipeline with no interpreted-eval call per row.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductD =
    copy(left = l, right = r)
}

/** The order-preserving long image of a double: flip all bits of negatives,
  * the sign bit of non-negatives — `a < b  ⇔  sortableBits(a) < sortableBits
  * (b)` for all non-NaN doubles. Its high bits are a VALUE-ONLY monotone
  * bucket id (no min/max pre-pass needed), which is what lets the exact
  * quantile machinery fuse its histogram with the stats aggregate into one
  * job. Implements doGenCode so bucketing stays inside whole-stage codegen.
  */
case class SortableDoubleBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    java.lang.Long.valueOf(b ^ (if (b < 0) -1L else Long.MinValue))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.freshName("bits")
      s"""
         |long $b = java.lang.Double.doubleToLongBits($a);
         |${ev.value} = $b ^ (($b < 0) ? -1L : java.lang.Long.MIN_VALUE);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SortableDoubleBits =
    copy(child = c)
}

/** Shared element accessor for vector expressions that accept either
  * array<float> (the storage type) or array<double>: reading the float
  * directly and widening per element avoids materializing a whole cast
  * array per row. (double)(float) is exact, so the arithmetic is identical
  * to casting upstream — which is what the DuckDB oracle replays.
  */
private[functions] trait VectorElem { self: UnaryExpression =>
  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def elem(v: ArrayData, i: Int): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
}

/** Symmetric int8 quantization scale max|x|/127 of a vector — comparisons
  * only, so bit-reproducible regardless of element order.
  */
case class Int8Scale(child: Expression)
    extends UnaryExpression with CodegenFallback with VectorElem {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) { val a = math.abs(elem(v, i)); if (a > m) m = a }
      i += 1
    }
    java.lang.Double.valueOf(m / 127.0)
  }

  override protected def withNewChildInternal(c: Expression): Int8Scale = copy(child = c)
}

/** Symmetric int8 quantization q_i = round_half_up(x_i / (max|x|/127)) in
  * one tight loop per row. The transform()+when()+floor() composition pays
  * an interpreted lambda frame per ELEMENT (dim × rows frames per pass);
  * this computes the identical IEEE arithmetic — same divisions, same
  * binary-value HALF-UP — so the DuckDB oracle replay is unchanged.
  */
case class Int8Quantize(child: Expression)
    extends UnaryExpression with CodegenFallback with VectorElem {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) { val a = math.abs(elem(v, i)); if (a > m) m = a }
      i += 1
    }
    val scale = m / 127.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val q =
          if (scale == 0.0) 0.0
          else {
            val r = elem(v, i) / scale
            if (r >= 0) math.floor(r + 0.5) else -math.floor(-r + 0.5)
          }
        out(i) = q.toInt
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Int8Quantize = copy(child = c)
}

/** BPE token count of a whitespace-tokenized STRING under a fixed merge
  * table: per word, character symbols merged by [[graft.llm.Bpe]]'s
  * rank-ordered leftmost passes (the pinned cross-engine semantics — the
  * expression delegates to the same code the specs and the driver-side
  * twin use, so there is exactly ONE implementation of the merge loop).
  * The merge table rides in the expression tree as a literal — tokenizer
  * vocabularies are config-sized artifacts, not data.
  */
case class BpeCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      graft.llm.Bpe.countTokens(input.asInstanceOf[UTF8String].toString, merges))

  override protected def withNewChildInternal(c: Expression): BpeCount = copy(child = c)
}

/** Per-document logistic-gradient contributions under the CURRENT model
  * snapshot (weights ride as a literal, re-planned each epoch):
  * `(text, label) → array<struct<idx, gm>>` of micro-unit feature
  * gradients plus the bias term at idx −1. Delegates to
  * [[graft.llm.QualityModel.gradContribs]] — one implementation, shared
  * with the driver twin. This is what lets [[graft.llm.QualityModel
  * .trainDistributed]] train with document text never leaving the
  * executors: the corpus-sized relation feeds a keyed SUM and only the
  * dim-bounded aggregate is collected.
  */
case class QualityGrad(left: Expression, right: Expression,
                       weights: Seq[Double], bias: Double)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("idx", IntegerType), StructField("gm", LongType))))

  private lazy val model =
    graft.llm.QualityModel.Model(weights.toArray, bias)

  override def nullSafeEval(text: Any, label: Any): Any =
    new GenericArrayData(graft.llm.QualityModel.gradContribs(
        text.asInstanceOf[UTF8String].toString,
        label.asInstanceOf[Double], model)
      .map { case (i, g) =>
        org.apache.spark.sql.catalyst.InternalRow(i, g)
      })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): QualityGrad = copy(left = l, right = r)
}

/** Image header metadata of a BINARY payload — `(format, width, height)`
  * struct, or NULL when the bytes parse as neither PNG nor JPEG. Delegates
  * to [[graft.llm.Multimodal.decodeImageMeta]] (ONE implementation of the
  * byte walk, shared with the driver twin and the specs): PNG IHDR fixed
  * offsets, JPEG marker walk to SOF. Pure per-row byte arithmetic — no
  * codec library, no shuffle, scales like any columnar map.
  */
case class ImageMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  override def nullSafeEval(input: Any): Any =
    graft.llm.Multimodal.decodeImageMeta(input.asInstanceOf[Array[Byte]]) match {
      case Some((f, w, h)) =>
        org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(f),
          java.lang.Integer.valueOf(w), java.lang.Integer.valueOf(h))
      case None => null
    }

  override protected def withNewChildInternal(c: Expression): ImageMeta = copy(child = c)
}

/** The BPE token SEQUENCE of a STRING under a fixed merge table —
  * `array<string>` of merged symbols in document order (what packing and
  * training consume; [[BpeCount]] is its length). Same single merge-loop
  * implementation ([[graft.llm.Bpe.encodeTokens]]).
  */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(graft.llm.Bpe.encodeTokens(
        input.asInstanceOf[UTF8String].toString, merges)
      .map(UTF8String.fromString))

  override protected def withNewChildInternal(c: Expression): BpeTokens = copy(child = c)
}

/** Unigram-LM tokenizer stats of a whitespace-tokenized STRING under a
  * fixed piece-cost table — `(n_pieces, cost)` struct: Viterbi-optimal
  * piece count and total micro-nat cost, summed over words. Delegates to
  * [[graft.llm.Unigram.encodeStats]] (ONE implementation of the DP,
  * shared with the driver twin and the recursive-CTE oracle's contract).
  * The vocab rides the expression tree as a literal, like [[BpeCount]]'s
  * merge table — tokenizer vocabularies are config-sized artifacts.
  */
case class UnigramStats(child: Expression, pieces: Seq[(String, Long)],
                        total: Long, maxLen: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType), StructField("cost", LongType)))

  @transient private lazy val vocab =
    graft.llm.Unigram.Vocab(pieces.toMap, total, maxLen)

  override def nullSafeEval(input: Any): Any = {
    val (np, c) = graft.llm.Unigram.encodeStats(
      input.asInstanceOf[UTF8String].toString, vocab)
    org.apache.spark.sql.catalyst.InternalRow(np, c)
  }

  override protected def withNewChildInternal(c: Expression): UnigramStats = copy(child = c)
}

/** The unigram-LM PIECE sequence of a STRING — `array<string>` of
  * Viterbi-optimal pieces in document order ([[UnigramStats]]' first
  * field is its length). The E-step workhorse of
  * [[graft.llm.Unigram.train]]: evaluated over the distinct-word
  * relation, its exploded output re-counts piece usage with one keyed
  * aggregate. Same backpointer DP as [[graft.llm.Unigram.segment]].
  */
case class UnigramPieces(child: Expression, pieces: Seq[(String, Long)],
                         total: Long, maxLen: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType)

  @transient private lazy val vocab =
    graft.llm.Unigram.Vocab(pieces.toMap, total, maxLen)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(graft.llm.Unigram.encodePieces(
        input.asInstanceOf[UTF8String].toString, vocab)
      .map(UTF8String.fromString))

  override protected def withNewChildInternal(c: Expression): UnigramPieces = copy(child = c)
}

/** Span-removal cleanup of a token array: given the sorted 1-based start
  * positions of k-token windows to cut, returns `(clean_text, n_removed)`
  * — the text with every token covered by ≥1 listed window removed,
  * rejoined on single spaces. Two-pointer sweep, O(tokens + starts): a
  * token at position j is covered iff some consumed start p ≤ j has
  * p + k − 1 ≥ j, i.e. the running max window end reaches j. The
  * doc-local half of [[graft.llm.Dedup.removeDuplicatedSpans]] — the
  * corpus-wide duplicate decision arrives as the `starts` column.
  */
case class RemoveCoveredSpans(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType), StructField("n_removed", LongType)))

  override def nullSafeEval(toks: Any, starts: Any): Any = {
    val ts = toks.asInstanceOf[ArrayData]
    val ss = starts.asInstanceOf[ArrayData]
    val n = ts.numElements()
    val m = ss.numElements()
    val sb = new java.lang.StringBuilder
    var removed = 0L
    var si = 0
    var maxEnd = 0L
    var j = 1
    while (j <= n) {
      while (si < m && ss.getLong(si) <= j) {
        val e = ss.getLong(si) + k - 1
        if (e > maxEnd) maxEnd = e
        si += 1
      }
      if (maxEnd >= j) removed += 1
      else {
        if (sb.length > 0) sb.append(' ')
        sb.append(ts.getUTF8String(j - 1).toString)
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(sb.toString), removed)
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): RemoveCoveredSpans = copy(left = l, right = r)
}

/** Total occurrences of ANY of a fixed pattern list in a STRING —
  * overlapping substring matches, counted by a compiled Aho–Corasick
  * automaton in ONE pass (O(text + matches) independent of pattern
  * count; the blocklist kernel of [[graft.llm.Blocklist]]). The pattern
  * list rides the tree as a literal; the automaton compiles lazily per
  * executor.
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  @transient private lazy val ac = graft.llm.Blocklist.compile(patterns)

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(graft.llm.Blocklist.countMatches(
      input.asInstanceOf[UTF8String].toString, ac))

  override protected def withNewChildInternal(c: Expression): MultiPatternCount = copy(child = c)
}

/** Hashed bag-of-words logistic quality score of a STRING (one tight loop
  * per row; delegates to [[graft.llm.QualityModel.scoreText]] so the merge
  * of semantics lives in exactly one place). Weights are a config-sized
  * literal in the expression tree, like [[BpeCount]]'s merge table.
  */
case class QualityScore(child: Expression, weights: Seq[Double], bias: Double)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType

  private lazy val model =
    graft.llm.QualityModel.Model(weights.toArray, bias)

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(graft.llm.QualityModel.scoreText(
      input.asInstanceOf[UTF8String].toString, model))

  override protected def withNewChildInternal(c: Expression): QualityScore = copy(child = c)
}

/** Content-defined chunks of a text column (the rsync/LBFS/FastCDC
  * family): cut after any position whose ROLLING window hash lands in the
  * boundary residue class, so chunk boundaries depend only on local
  * content — an insertion early in a document shifts every fixed-size
  * block but leaves all content-defined chunks after the next boundary
  * byte-identical, which is what makes chunk-hash dedup robust to
  * prepended boilerplate. Returns `array<struct<idx, start, len, hash>>`
  * (start 1-based — SQL substr convention).
  *
  * The boundary rule at code-point position i (1-based, i ≥ w) is
  * `H(i) % divisor == divisor − 1` where H(i) is the [[PolyHash]] base-31
  * mod-1e9+7 fold over the last `w` code points — STATELESS, so the exact
  * boundary set (and per-chunk hash, the same fold over the chunk) replays
  * in the DuckDB oracle with plain integer arithmetic. Production CDC adds
  * min/max chunk clamps (those make boundaries history-dependent); the
  * pure rule keeps expected chunk length = `divisor` chars and the oracle
  * exact. One O(n) pass per row — the rolling update subtracts the
  * outgoing code point, no per-position refold.
  */
case class CdcChunks(child: Expression, w: Int, divisor: Long)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1 && divisor >= 2)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("idx", IntegerType), StructField("start", IntegerType),
    StructField("len", IntegerType), StructField("hash", LongType))))

  private val pw1: Long = { // B1^(w-1) mod P1
    var r = 1L; var i = 1
    while (i < w) { r = (r * PolyHash.B1) % PolyHash.P1; i += 1 }
    r
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // code points (DuckDB substr/length count characters, not UTF-16 units)
    val cps = new Array[Int](s.codePointCount(0, s.length))
    var ci = 0; var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      cps(ci) = cp; ci += 1; off += Character.charCount(cp)
    }
    val n = cps.length
    val out = new scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.catalyst.InternalRow]()
    var win = 0L // rolling hash of the last min(i+1, w) code points
    var ch = 0L  // running hash of the current chunk
    var start = 0 // 0-based chunk start
    var idx = 0
    var i = 0
    while (i < n) {
      val cp = cps(i)
      if (i >= w) {
        val drop = (cps(i - w) * pw1) % PolyHash.P1
        win = ((win - drop) % PolyHash.P1 + PolyHash.P1) % PolyHash.P1
      }
      win = (win * PolyHash.B1 + cp) % PolyHash.P1
      ch = (ch * PolyHash.B1 + cp) % PolyHash.P1
      if (i >= w - 1 && win % divisor == divisor - 1) {
        out += org.apache.spark.sql.catalyst.InternalRow(
          idx + 1, start + 1, i - start + 1, ch)
        idx += 1; start = i + 1; ch = 0L
      }
      i += 1
    }
    if (start < n)
      out += org.apache.spark.sql.catalyst.InternalRow(
        idx + 1, start + 1, n - start, ch)
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): CdcChunks =
    copy(child = c)
}

/** Deflate (zlib) compressed byte count of the UTF-8 text — the
  * compression-ratio quality signal's kernel (Gopher/RefinedWeb axis:
  * highly compressible = repetitive/templated text, near-incompressible =
  * high-entropy noise; both tails are dropped by quality filters). Returns
  * the compressed size; the ratio against `octet_length` is columnar
  * arithmetic downstream. Deterministic for a fixed (level, JVM zlib) —
  * but zlib is ENGINE-SPECIFIC, so this signal is ScalaTest-pinned rather
  * than oracle-gated (the profile-approx-mode convention). Doc-local ⇒ a
  * 100 TB scoring pass is one shuffle-free projection.
  */
case class DeflateSize(child: Expression, level: Int)
    extends UnaryExpression with CodegenFallback {
  require(level >= 0 && level <= 9, s"deflate level must be in [0,9]: $level")
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = new java.util.zip.Deflater(level, false)
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    java.lang.Long.valueOf(total)
  }

  override protected def withNewChildInternal(c: Expression): DeflateSize = copy(child = c)
}

/** A REAL synthesized PNG byte stream from (width, height, variant) —
  * [[graft.llm.Multimodal.encodePng]] with the deterministic pattern
  * `channel(x, y, c) = (7x + 13y + variant + 101c) mod 256`, RGB, all
  * five scanline filters cycled by row. The pattern is plain modular
  * arithmetic so an oracle can state the expected DECODED content
  * without any codec; the bytes in between are genuine zlib-compressed,
  * CRC'd PNG.
  */
case class SyntheticPng(first: Expression, second: Expression,
                        third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType

  override def nullSafeEval(w: Any, h: Any, v: Any): Any = {
    val width = w.asInstanceOf[Number].intValue()
    val height = h.asInstanceOf[Number].intValue()
    val variant = v.asInstanceOf[Number].intValue()
    graft.llm.Multimodal.encodePng(width, height, 3,
      (x, y, c) => (7 * x + 13 * y + variant + 101 * c) % 256)
  }

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): SyntheticPng = copy(first = a, second = b, third = c)
}

/** A REAL synthesized PNG whose pattern is a per-image GRADIENT
  * `pixel(x, y, ·) = (x·a + y·b) mod 200 + shift` (all three channels
  * equal): distinct (a, b) slopes give structurally distinct images while
  * `shift ≤ 55` is a pure brightness offset that never wraps — exactly the
  * perturbation a mean-thresholded perceptual hash ([[ImageAHash64]]) is
  * invariant to, which is what the image near-dup gate needs a formula
  * for. Dimensions are constructor constants (the gate's rasters are
  * fixed-size); slopes/shift ride as columns.
  */
case class SyntheticPngGrad(imgW: Int, imgH: Int, first: Expression,
                            second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType

  override def nullSafeEval(a: Any, b: Any, s: Any): Any = {
    val sa = a.asInstanceOf[Number].intValue()
    val sb = b.asInstanceOf[Number].intValue()
    val sh = s.asInstanceOf[Number].intValue()
    require(sh >= 0 && sh <= 55, s"shift must stay wrap-free, got $sh")
    graft.llm.Multimodal.encodePng(imgW, imgH, 3,
      (x, y, _) => (x * sa + y * sb) % 200 + sh)
  }

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): SyntheticPngGrad = copy(first = a, second = b, third = c)
}

/** A REAL synthesized image — PNG or baseline JPEG (JDK encoder), chosen
  * by the `jpeg` flag — whose content is a per-group CHECKERBOARD of
  * 4×4-pixel cells at two MARGIN-ENGINEERED gray levels: exactly half the
  * 8×8 grid cells at 200, half at 40 (the high half = the 32
  * smallest-ranked cell hashes of `group`), so the global mean is exactly
  * 120 and every cell mean sits 80 levels from it. JPEG quantization
  * perturbs flat-cell means by a few levels — far inside the margin —
  * which is what lets a LOSSY payload live under the hash-exact
  * [[ImageAHash64]] gate: the bit pattern (and therefore the dup pairs)
  * is a pure integer function of `group`, stated by the oracle, and the
  * PNG original and JPEG re-encode of a group MUST collide at Hamming 0.
  */
case class SyntheticImageCheck(imgW: Int, imgH: Int, left: Expression,
                               right: Expression)
    extends BinaryExpression with CodegenFallback {
  require(imgW % 8 == 0 && imgH % 8 == 0, "cells must align with the 8x8 grid")
  override def dataType: DataType = BinaryType

  override def nullSafeEval(g: Any, j: Any): Any = {
    val group = g.asInstanceOf[Number].longValue()
    val jpeg = j.asInstanceOf[Boolean]
    val pixel = CheckCells.pixelFn(imgW, imgH, group)
    if (jpeg) graft.llm.Multimodal.encodeMjpeg(imgW, imgH, 1,
      (_, x, y, c) => pixel(x, y))
    else graft.llm.Multimodal.encodePng(imgW, imgH, 3,
      (x, y, _) => pixel(x, y))
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SyntheticImageCheck = copy(left = l, right = r)
}

/** The margin-engineered checkerboard shared by every codec leg of the
  * mixed perceptual gates: rank the 64 cells by a NONLINEAR mix of
  * (group, cell); the 32 smallest are HIGH (200), the rest LOW (40). An
  * affine hash would shift all 64 values by a group-constant and
  * preserve most ranks — adjacent groups would come out near-identical;
  * mix32's xorshift rounds decorrelate them.
  */
private[functions] object CheckCells {
  def pixelFn(imgW: Int, imgH: Int, group: Long): (Int, Int) => Int = {
    val ranked = (0 until 64)
      .map(k => (graft.llm.Corpus.mix32L(group * 64 + k), k))
      .sorted.map(_._2)
    val high = ranked.take(32).toSet
    val cw = imgW / 8; val chh = imgH / 8
    (x: Int, y: Int) => {
      val k = (y / chh) * 8 + (x / cw)
      if (high(k)) 200 else 40
    }
  }
}

/** The GIF leg of the checkerboard family — same [[CheckCells]] pattern
  * through the LZW codec over a gray palette (GIF is lossless, so the
  * raster is exact and the aHash bits are the formula's bits with no
  * margin argument needed).
  */
case class SyntheticImageCheckGif(imgW: Int, imgH: Int, child: Expression)
    extends UnaryExpression with CodegenFallback {
  require(imgW % 8 == 0 && imgH % 8 == 0, "cells must align with the 8x8 grid")
  override def dataType: DataType = BinaryType

  private lazy val grayPal = Array.tabulate(256)(i => (i << 16) | (i << 8) | i)

  override def nullSafeEval(g: Any): Any = {
    val group = g.asInstanceOf[Number].longValue()
    graft.llm.Gif.encode(imgW, imgH, grayPal,
      CheckCells.pixelFn(imgW, imgH, group))
  }

  override protected def withNewChildInternal(c: Expression): SyntheticImageCheckGif =
    copy(child = c)
}

/** 64-bit average-hash (aHash) of an image payload's DECODED raster —
  * PNG or baseline JPEG, dispatched by magic bytes
  * ([[graft.llm.Multimodal.decodeImage]]): format must never matter to a
  * perceptual hash, so a PNG original and its JPEG re-encode hash from
  * their rasters through ONE rule. The image is binned into an 8×8 grid
  * (floor-division bins, so any dimensions work), and bit `8·by + bx` is
  * set iff that cell's mean of channel 0 exceeds the whole-image mean —
  * compared in exact integer cross-multiplied form
  * `cell_sum · n_pixels > total_sum · cell_count`, so the hash replays
  * bit-identically in any engine from the pixel formula. Brightness
  * shifts cancel in the comparison (both sides gain the same offset),
  * which is the perceptual property: re-encodes and exposure tweaks keep
  * the hash, unrelated images differ in ~32 bits. JPEG quantization
  * perturbs cell means by a few levels, so bits stay formula-predictable
  * whenever the pattern's cell-vs-global margin dominates (the
  * dedup_phash_mixed gate engineers an 80-level margin). NULL when the
  * bytes decode as neither format. Products stay within Long: both
  * decoders cap rasters at 2^30 samples.
  */
case class ImageAHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    graft.llm.Multimodal.decodeImage(input.asInstanceOf[Array[Byte]]) match {
      case None => null
      case Some(img) =>
        val w = img.width; val h = img.height; val ch = img.channels
        val sums = new Array[Long](64)
        val cnts = new Array[Long](64)
        var total = 0L
        var y = 0
        while (y < h) {
          val by = y * 8 / h
          var x = 0
          while (x < w) {
            val k = by * 8 + x * 8 / w
            val v = img.pixels((y * w + x) * ch) & 0xFF
            sums(k) += v; cnts(k) += 1; total += v
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        var hash = 0L
        var k = 0
        while (k < 64) {
          if (cnts(k) > 0 && sums(k) * n > total * cnts(k)) hash |= 1L << k
          k += 1
        }
        java.lang.Long.valueOf(hash)
    }

  override protected def withNewChildInternal(c: Expression): ImageAHash64 =
    copy(child = c)
}

/** The 8×32 fixed-point DCT-II basis shared by [[ImageDctHash64]] and its
  * oracle: `C(u)(x) = round(cos((2x+1)·u·π/64) · 2^14)`, rounded half AWAY
  * FROM ZERO so the table keeps the cosine's antisymmetry
  * (`C(u)(31−x) = ±C(u)(x)` exactly). Two consequences the hash leans on:
  * every AC row sums to exactly 0 (so a uniform brightness shift moves NO
  * AC coefficient — the perceptual invariance is EXACT in integers, not
  * approximate), and the whole transform is integer multiply-adds bounded
  * by 32·255·2^28 < 2^42 — replayable bit-identically from a literal
  * matrix in any engine.
  */
object Dct8x32 {
  val Scale = 16384L
  val C: Array[Array[Long]] = Array.tabulate(8, 32) { (u, x) =>
    val raw = math.cos((2 * x + 1) * u * math.Pi / 64) * Scale
    (math.signum(raw) * math.round(math.abs(raw))).toLong
  }
}

/** 64-bit DCT perceptual hash (pHash) of an image payload's decoded
  * raster — the frequency-domain companion of [[ImageAHash64]]: the
  * raster bins to a 32×32 integer grayscale (floor-division bins, floor
  * cell means — exact on the gate's native 32×32 images), a separable
  * integer 2D DCT ([[Dct8x32]]) keeps the top-left 8×8 coefficient
  * block, and bit `8u+v` (v the vertical frequency) is set iff
  * `F[u][v]` exceeds the LOWER MEDIAN of the 63 AC coefficients (the
  * 32nd smallest — well-defined on ties). The DC bit is always 0, so
  * the hash sees only shape, never overall level: a uniform brightness
  * shift leaves every bit EXACTLY unchanged (zero AC row sums), where
  * aHash's invariance needs its margin argument. PNG or baseline JPEG
  * by magic bytes; NULL when the bytes decode as neither. All
  * arithmetic is exact Long (|F| ≤ 32²·255·2^28 < 2^47), so the hash —
  * and every dup pair built from it — replays bit-identically from the
  * pixel formula in the DuckDB oracle.
  */
case class ImageDctHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    graft.llm.Multimodal.decodeImage(input.asInstanceOf[Array[Byte]]) match {
      case None => null
      case Some(img) => java.lang.Long.valueOf(ImageDctHash64.ofRaster(img))
    }

  override protected def withNewChildInternal(c: Expression): ImageDctHash64 =
    copy(child = c)
}

object ImageDctHash64 {
  /** The raster → 64-bit DCT hash kernel, shared with the per-frame video
    * leg ([[ClipFrameDctHashes]]).
    */
  def ofRaster(img: graft.llm.Multimodal.PngImage): Long = {
    val w = img.width; val h = img.height; val ch = img.channels
    val sums = new Array[Long](1024)
    val cnts = new Array[Long](1024)
    var y = 0
    while (y < h) {
      val by = y * 32 / h
      var x = 0
      while (x < w) {
        val k = by * 32 + x * 32 / w
        sums(k) += img.pixels((y * w + x) * ch) & 0xFF
        cnts(k) += 1
        x += 1
      }
      y += 1
    }
    val q = new Array[Long](1024)
    var k = 0
    while (k < 1024) {
      if (cnts(k) > 0) q(k) = sums(k) / cnts(k)
      k += 1
    }
    // separable: G[u][y] = Σ_x C[u][x]·q[y][x]; F[8u+v] = Σ_y C[v][y]·G[u][y]
    val g = new Array[Long](8 * 32)
    var u = 0
    while (u < 8) {
      val cu = Dct8x32.C(u)
      var yy = 0
      while (yy < 32) {
        var s = 0L
        var x = 0
        while (x < 32) { s += cu(x) * q(yy * 32 + x); x += 1 }
        g(u * 32 + yy) = s
        yy += 1
      }
      u += 1
    }
    val f = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        val cv = Dct8x32.C(v)
        var s = 0L
        var yy = 0
        while (yy < 32) { s += cv(yy) * g(u * 32 + yy); yy += 1 }
        f(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val ac = java.util.Arrays.copyOfRange(f, 1, 64)
    java.util.Arrays.sort(ac)
    val med = ac(31)
    var hash = 0L
    k = 1
    while (k < 64) {
      if (f(k) > med) hash |= 1L << k
      k += 1
    }
    hash
  }
}

/** Decoded-pixel statistics of a PNG payload — `(width, height, channels,
  * sum_r, sum_g, sum_b)`, or NULL when [[graft.llm.Multimodal.decodePng]]
  * rejects the bytes. The sums run over the fully DEFILTERED raster, so
  * any predictor or inflate slip shows up as a wrong sum — this is how
  * the gate pins the decoder against the construction formula.
  */
case class PngPixelStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType), StructField("sum_r", LongType),
    StructField("sum_g", LongType), StructField("sum_b", LongType)))

  override def nullSafeEval(input: Any): Any =
    graft.llm.Multimodal.decodePng(input.asInstanceOf[Array[Byte]]) match {
      case None => null
      case Some(img) =>
        val sums = new Array[Long](3)
        val n = img.width * img.height
        var p = 0
        while (p < n) {
          var c = 0
          while (c < 3) {
            sums(c) += img.pixels(p * img.channels + c) & 0xFF
            c += 1
          }
          p += 1
        }
        org.apache.spark.sql.catalyst.InternalRow(
          java.lang.Integer.valueOf(img.width),
          java.lang.Integer.valueOf(img.height),
          java.lang.Integer.valueOf(img.channels),
          java.lang.Long.valueOf(sums(0)), java.lang.Long.valueOf(sums(1)),
          java.lang.Long.valueOf(sums(2)))
    }

  override protected def withNewChildInternal(c: Expression): PngPixelStats =
    copy(child = c)
}

/** A REAL synthesized GIF89a from (width, height, variant): 256-entry
  * global palette `i → (i, (i+101) mod 256, (i+202) mod 256)` and index
  * pattern `(7x + 13y + v) mod 256`, LZW-compressed by the from-scratch
  * [[graft.llm.Gif]] encoder — the same pattern formula the PNG gate
  * uses, under a different (LZW) compression family.
  */
case class SyntheticGif(first: Expression, second: Expression,
                        third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType

  override def nullSafeEval(w: Any, h: Any, v: Any): Any = {
    val width = w.asInstanceOf[Number].intValue()
    val height = h.asInstanceOf[Number].intValue()
    val variant = v.asInstanceOf[Number].intValue()
    val palette = Array.tabulate(256)(i =>
      (i << 16) | (((i + 101) % 256) << 8) | ((i + 202) % 256))
    graft.llm.Gif.encode(width, height, palette,
      (x, y) => (7 * x + 13 * y + variant) % 256)
  }

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): SyntheticGif = copy(first = a, second = b, third = c)
}

/** Decoded-pixel statistics of a GIF payload — `(width, height, sum_r,
  * sum_g, sum_b)` over the palette-RESOLVED raster, or NULL when
  * [[graft.llm.Gif.decode]] rejects the bytes. Any LZW or palette slip
  * shows up as a wrong sum — the gate's pin against the formula.
  */
case class GifPixelStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("sum_r", LongType), StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  override def nullSafeEval(input: Any): Any =
    graft.llm.Gif.decode(input.asInstanceOf[Array[Byte]]) match {
      case None => null
      case Some(img) =>
        var sr = 0L; var sg = 0L; var sb = 0L
        val n = img.width * img.height
        var p = 0
        while (p < n) {
          val c = img.rgb(p)
          sr += (c >> 16) & 0xFF; sg += (c >> 8) & 0xFF; sb += c & 0xFF
          p += 1
        }
        org.apache.spark.sql.catalyst.InternalRow(
          java.lang.Integer.valueOf(img.width),
          java.lang.Integer.valueOf(img.height),
          java.lang.Long.valueOf(sr), java.lang.Long.valueOf(sg),
          java.lang.Long.valueOf(sb))
    }

  override protected def withNewChildInternal(c: Expression): GifPixelStats =
    copy(child = c)
}

/** A REAL synthesized WAV byte stream from (nSamples, variant) — 16-bit
  * mono PCM at 16 kHz via [[graft.llm.Multimodal.encodeWav]], with the
  * deterministic sample formula `s(i) = ((31i² + 17i + 97·variant) mod
  * 65536) − 32768`: plain BIGINT modular arithmetic, so an oracle can
  * state the decoded clip's statistics without any audio library.
  */
case class SyntheticWav(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType

  override def nullSafeEval(n: Any, v: Any): Any = {
    val nSamples = n.asInstanceOf[Number].intValue()
    val variant = v.asInstanceOf[Number].longValue()
    val samples = Array.tabulate(nSamples) { i =>
      (((31L * i * i + 17L * i + 97L * variant) % 65536L) - 32768L).toShort
    }
    graft.llm.Multimodal.encodeWav(16000, 1, samples)
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SyntheticWav = copy(left = l, right = r)
}

/** A REAL synthesized IMA-ADPCM WAVE clip from (nSamples, variant): a
  * triangle wave whose period (64 + v mod 64) and DC offset
  * (96·(v/64 mod 16)) both derive from the variant — 1024 structurally
  * distinct waveforms — compressed through the genuine
  * [[graft.llm.Adpcm]] encoder (4-byte block headers, carried step index,
  * zero-padded final block, `fact`-chunk truncation). Clips sharing a
  * variant share their full sample prefix, so their encoded (and decoded)
  * 505-sample blocks are IDENTICAL up to the shorter length — the
  * compressed-audio dedup gate's ground truth; the AdpcmDistinct spec
  * proves the converse (distinct (variant, block) ⇒ distinct decoded
  * content) exhaustively over the gate's whole parameter space.
  */
case class SyntheticWavAdpcm(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType

  override def nullSafeEval(n: Any, v: Any): Any = {
    val nSamples = n.asInstanceOf[Number].intValue()
    val variant = v.asInstanceOf[Number].intValue()
    graft.llm.Multimodal.encodeWavAdpcm(16000,
      SyntheticWavAdpcm.samples(nSamples, variant))
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SyntheticWavAdpcm = copy(left = l, right = r)
}

object SyntheticWavAdpcm {
  /** The raw waveform — shared with the exhaustive-distinctness spec.
    * Period 101 is remapped to 128: 2·101 = 202 divides 505·2, so p = 101
    * repeats its raw content every second BLOCK (505 ≡ 0 mod 202 after
    * two), and the exhaustive sweep showed the decoded contents collide
    * too — the one period in [64, 127] whose triangle aliases the block
    * length (128 aliases nothing: 256 divides no 505·d, d ≤ 3).
    */
  def samples(nSamples: Int, variant: Int): Array[Short] = {
    val p0 = 64 + (variant % 64)
    val p = if (p0 == 101) 128 else p0
    val dc = 96 * ((variant / 64) % 16)
    Array.tabulate(nSamples) { i =>
      val ph = i % (2 * p)
      (256 * (p - math.abs(ph - p)) - 128 * p + dc).toShort
    }
  }
}

/** Per-window content hashes of a WAV payload's DECODED PCM: one
  * [[PolyHash]] base-31 mod-1e9+7 fold per FULL `window`-sample window
  * (tail remainder discarded — the audio-fingerprinting convention),
  * folding the UNSIGNED sample image `s + 32768` so the polynomial stays
  * in nonnegative BIGINT arithmetic any engine replays. Multi-channel
  * audio hashes the interleaved stream (channel-coherent windows).
  * NULL when [[graft.llm.Multimodal.decodeWav]] rejects the bytes. The
  * audio leg of the decoded-raster hash family ([[ClipFrameHashes]] for
  * video): equal window hash ⇔ byte-equal decoded PCM window.
  */
case class WavWindowHashes(child: Expression, window: Int)
    extends UnaryExpression with CodegenFallback {
  require(window >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    graft.llm.Multimodal.decodeWav(input.asInstanceOf[Array[Byte]]) match {
      case None => null
      case Some(a) =>
        val s = a.samples
        val nw = s.length / window
        val out = new Array[Long](nw)
        var w = 0
        while (w < nw) {
          var h = 0L
          var i = w * window
          val end = i + window
          while (i < end) {
            h = (h * PolyHash.B1 + (s(i) + 32768L)) % PolyHash.P1
            i += 1
          }
          out(w) = h
          w += 1
        }
        new GenericArrayData(out)
    }

  override protected def withNewChildInternal(c: Expression): WavWindowHashes =
    copy(child = c)
}

/** A REAL synthesized WAV with an integer GAIN stage: the base waveform
  * `b(i) = (mix32(variant·2^20 + i) mod 8192) − 4096` times
  * `gain ∈ [1, 8]` — still a genuine 16-bit PCM clip (|s| ≤ 32760), but
  * docs sharing a variant at different gains have entirely different PCM
  * bytes while their spectra differ only by an integer factor. That is
  * exactly the perturbation [[WavSpectralHashes]] is exactly invariant to
  * and the content-hash leg ([[WavWindowHashes]]) is blind to — the
  * spectral dedup gate's formula. The base is the NONLINEAR mix32
  * scatter, not the [[SyntheticWav]] polynomial: `31i² + 17i + 97v`
  * collapses modulo small powers of two across (variant, window) pairs —
  * structurally shared windows by the tens of thousands (the same
  * affine-aliasing lesson as the checkerboard rank hash) — while mixed
  * windows are variant-unique.
  */
case class SyntheticWavGain(first: Expression, second: Expression,
                            third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType

  override def nullSafeEval(n: Any, v: Any, g: Any): Any = {
    val nSamples = n.asInstanceOf[Number].intValue()
    val variant = v.asInstanceOf[Number].longValue()
    val gain = g.asInstanceOf[Number].intValue()
    require(gain >= 1 && gain <= 8, s"gain must stay within s16, got $gain")
    val samples = Array.tabulate(nSamples) { i =>
      (((graft.llm.Corpus.mix32L(variant * 1048576L + i) % 8192L) - 4096L)
        * gain).toShort
    }
    graft.llm.Multimodal.encodeWav(16000, 1, samples)
  }

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): SyntheticWavGain = copy(first = a, second = b, third = c)
}

/** The shared fixed-point DFT cosine table ([[WavSpectralHashes]] and its
  * oracle): `T(j) = round(cos(2πj/window) · 2^7)`, rounded half away from
  * zero. One table serves both components — `cos(2πki/w) = T((k·i) mod w)`
  * and `sin(2πki/w) = T((k·i + 3w/4) mod w)` — so the oracle states
  * `window` literals, not `window²`.
  */
object DftTable {
  def apply(window: Int): Array[Long] = Array.tabulate(window) { j =>
    val raw = math.cos(2 * math.Pi * j / window) * 128
    (math.signum(raw) * math.round(math.abs(raw))).toLong
  }
}

/** SPECTRAL fingerprint shingles of a WAV payload's decoded PCM — the
  * frequency-domain audio leg (Wang 2003's constellation idea reduced to
  * its deterministic core), where [[WavWindowHashes]] is the byte-exact
  * content leg: per full `window`-sample window, an integer fixed-point
  * DFT (ONE shared `window`-entry cosine table at scale 2^7, rounded half
  * away from zero; `sin` reads the same table at a `3·window/4` modular
  * phase offset) scores bins `1 .. window/4 − 1`, the window's landmark is
  * its TOP-2 bins by (mag² DESC, bin ASC) packed as `k₁·16 + k₂` (one
  * peak alone is ~4 bits — chance shingle collisions at corpus scale),
  * and every `shingle`-length run of consecutive landmarks folds to a
  * PolyHash — the emitted fingerprint hashes. All arithmetic is exact BIGINT
  * (|re| ≤ window·2^15·2^7, mag² ≤ 2·2^56 at window 64), so the
  * fingerprint replays bit-identically from the sample formula plus the
  * literal table in the oracle.
  *
  * The perceptual property is GAIN invariance, and it is EXACT in
  * integers: an integer-scaled clip `s·m` scales re/im by `m` and every
  * squared magnitude by `m²`, leaving each window's argmax — and
  * therefore every landmark hash — unchanged, while the content-hash leg
  * sees entirely different PCM bytes. NULL when the bytes are not WAV.
  */
case class WavSpectralHashes(child: Expression, window: Int, shingle: Int)
    extends UnaryExpression with CodegenFallback {
  require(window >= 8 && window % 4 == 0, s"window must be a multiple of 4: $window")
  require(shingle >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val tab: Array[Long] = DftTable(window)

  override def nullSafeEval(input: Any): Any =
    graft.llm.Multimodal.decodeWav(input.asInstanceOf[Array[Byte]]) match {
      case None => null
      case Some(a) =>
        val s = a.samples
        val nw = s.length / window
        val nBins = window / 4 - 1
        val peaks = new Array[Int](nw)
        var w = 0
        while (w < nw) {
          // top-2 bins by (mag² DESC, k ASC): one peak alone (4 bits of
          // signal) makes chance shingle collisions routine at corpus
          // scale — the bin PAIR is the landmark
          var best = Long.MinValue; var bestK = 0
          var second = Long.MinValue; var secondK = 0
          var k = 1
          while (k <= nBins) {
            var re = 0L; var im = 0L
            var i = 0
            while (i < window) {
              val v = s(w * window + i).toLong
              val j = (k * i) % window
              re += v * tab(j)
              im += v * tab((j + 3 * window / 4) % window)
              i += 1
            }
            val mag = re * re + im * im
            if (mag > best) {
              second = best; secondK = bestK
              best = mag; bestK = k
            } else if (mag > second) { second = mag; secondK = k }
            k += 1
          }
          peaks(w) = bestK * 16 + secondK
          w += 1
        }
        val nSh = nw - shingle + 1
        if (nSh <= 0) new GenericArrayData(Array.empty[Long])
        else {
          val out = new Array[Long](nSh)
          var t = 0
          while (t < nSh) {
            var h = 0L
            var u = 0
            while (u < shingle) {
              h = (h * PolyHash.B1 + peaks(t + u)) % PolyHash.P1
              u += 1
            }
            out(t) = h
            t += 1
          }
          new GenericArrayData(out)
        }
    }

  override protected def withNewChildInternal(c: Expression): WavSpectralHashes =
    copy(child = c)
}

/** Decoded-PCM statistics of a WAV payload — `(sample_rate, channels,
  * n_samples, sum_sq, n_zero_cross, peak)`, or NULL when
  * [[graft.llm.Multimodal.decodeWav]] rejects the bytes. Integer-exact
  * (sum of squares as BIGINT, sign-change crossings, max |s|), so the
  * gate pins the decoder bit-for-bit against the construction formula.
  */
case class WavAudioStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
    StructField("n_samples", LongType), StructField("sum_sq", LongType),
    StructField("n_zero_cross", LongType), StructField("peak", IntegerType)))

  override def nullSafeEval(input: Any): Any =
    graft.llm.Multimodal.decodeWav(input.asInstanceOf[Array[Byte]]) match {
      case None => null
      case Some(a) =>
        var ss = 0L; var zc = 0L; var peak = 0
        var i = 0
        while (i < a.samples.length) {
          val s = a.samples(i).toInt
          ss += s.toLong * s
          if (math.abs(s) > peak) peak = math.abs(s)
          if (i > 0) {
            val p = a.samples(i - 1).toInt
            if ((p < 0 && s >= 0) || (p >= 0 && s < 0)) zc += 1
          }
          i += 1
        }
        org.apache.spark.sql.catalyst.InternalRow(
          java.lang.Integer.valueOf(a.sampleRate),
          java.lang.Integer.valueOf(a.channels),
          java.lang.Long.valueOf(a.samples.length.toLong),
          java.lang.Long.valueOf(ss), java.lang.Long.valueOf(zc),
          java.lang.Integer.valueOf(peak))
    }

  override protected def withNewChildInternal(c: Expression): WavAudioStats =
    copy(child = c)
}

/** A REAL synthesized ANIMATED GIF from (width, height, nFrames,
  * variant) — [[graft.llm.Gif.encodeAnimated]] with per-frame index
  * pattern `(7x + 13y + 31f + variant) mod 256` over the standard
  * `i → (i, (i+101) mod 256, (i+202) mod 256)` palette. The animation
  * twin of [[SyntheticGif]].
  */
case class SyntheticGifAnim(frameStep: Int, first: Expression,
                            second: Expression, third: Expression,
                            fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType

  override def nullSafeEval(w: Any, h: Any, n: Any, v: Any): Any = {
    val width = w.asInstanceOf[Number].intValue()
    val height = h.asInstanceOf[Number].intValue()
    val nFrames = n.asInstanceOf[Number].intValue()
    val variant = v.asInstanceOf[Number].intValue()
    val palette = Array.tabulate(256)(i =>
      (i << 16) | (((i + 101) % 256) << 8) | ((i + 202) % 256))
    // frameStep 23 makes frame f's raster byte-identical to
    // SyntheticApng's (7x + 13y + 23f + v + 101c): the palette supplies
    // the +101c channel shifts — the cross-container clip gate's hook
    graft.llm.Gif.encodeAnimated(width, height, nFrames, palette,
      f => (x, y) => (7 * x + 13 * y + frameStep * f + variant) % 256)
  }

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): SyntheticGifAnim =
    copy(first = a, second = b, third = c, fourth = d)
}

/** A REAL synthesized APNG clip from (width, height, nFrames, variant) —
  * [[graft.llm.Multimodal.encodeApng]] with the per-frame pattern
  * `channel(f, x, y, c) = (7x + 13y + 23f + variant + 101c) mod 256`,
  * RGB, genuine acTL/fcTL/fdAT chunk bookkeeping and per-frame zlib
  * streams. The animation twin of [[SyntheticPng]].
  */
case class SyntheticApng(first: Expression, second: Expression,
                         third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType

  override def nullSafeEval(w: Any, h: Any, n: Any, v: Any): Any = {
    val width = w.asInstanceOf[Number].intValue()
    val height = h.asInstanceOf[Number].intValue()
    val nFrames = n.asInstanceOf[Number].intValue()
    val variant = v.asInstanceOf[Number].intValue()
    graft.llm.Multimodal.encodeApng(width, height, 3, nFrames,
      (f, x, y, c) => (7 * x + 13 * y + 23 * f + variant + 101 * c) % 256)
  }

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): SyntheticApng =
    copy(first = a, second = b, third = c, fourth = d)
}

/** A REAL synthesized APNG whose frames are per-(group, frame) GRADIENTS
  * with a per-CLIP brightness offset: frame f's pattern is
  * `(x·a_f + y·b_f) mod 200 + shift` with `a_f = 1 + (31g + 7f) mod 97`,
  * `b_f = 1 + (13g + 11f) mod 83` — the video twin of
  * [[SyntheticPngGrad]]: clips of one group share every frame's
  * STRUCTURE while the shift (≤ 55, wrap-free) re-exposes the whole
  * clip, which is exactly what the per-frame DCT hash is exactly
  * invariant to and the exact frame-content hash is blind to. The DCT
  * invariance is exact only at the binning grid's native 32×32: a
  * smaller raster occupies part of the grid, the shift stops being
  * uniform over it, and the zero-row-sum argument no longer applies.
  */
case class SyntheticApngGrad(imgW: Int, imgH: Int, first: Expression,
                             second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType

  override def nullSafeEval(n: Any, g: Any, s: Any): Any = {
    val nFrames = n.asInstanceOf[Number].intValue()
    val group = g.asInstanceOf[Number].longValue()
    val shift = s.asInstanceOf[Number].intValue()
    require(shift >= 0 && shift <= 55, s"shift must stay wrap-free, got $shift")
    graft.llm.Multimodal.encodeApng(imgW, imgH, 3, nFrames, (f, x, y, _) => {
      val a = (1 + (31 * group + 7 * f) % 97).toInt
      val b = (1 + (13 * group + 11 * f) % 83).toInt
      (x * a + y * b) % 200 + shift
    })
  }

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): SyntheticApngGrad = copy(first = a, second = b, third = c)
}

/** Per-sampled-frame DCT PERCEPTUAL hashes of a video payload (APNG or
  * MJPEG by magic bytes) — [[ClipFrameHashes]] with the
  * [[ImageDctHash64]] kernel in place of the exact content fold: each
  * sampled frame's decoded raster bins to 32×32 and hashes in the
  * frequency domain, so re-exposed re-uploads (every pixel different)
  * still collide frame-for-frame at hash EQUALITY, exactly (the zero AC
  * row sums). `(frame_idx, fhash)` rows; NULL when neither container
  * decodes.
  */
case class ClipFrameDctHashes(child: Expression, sampleEvery: Int)
    extends UnaryExpression with CodegenFallback {
  require(sampleEvery >= 1, s"sampleEvery must be >= 1: $sampleEvery")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("frame_idx", IntegerType), StructField("fhash", LongType))))

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val frames =
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF &&
          (bytes(1) & 0xFF) == 0xD8)
        graft.llm.Multimodal.decodeMjpegFrames(bytes)
      else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == '8')
        // palette-resolved to RGB, so an equal-content APNG frame hashes
        // identically — container-blind clip dedup
        graft.llm.Multimodal.gifFramesAsRgb(bytes)
      else graft.llm.Multimodal.decodeApngFrames(bytes)
    frames match {
      case None => null
      case Some(fs) =>
        val rows = fs.zipWithIndex.collect {
          case (img, fi) if fi % sampleEvery == 0 =>
            org.apache.spark.sql.catalyst.InternalRow(
              java.lang.Integer.valueOf(fi),
              java.lang.Long.valueOf(ImageDctHash64.ofRaster(img)))
        }
        new GenericArrayData(rows.toArray[Any])
    }
  }

  override protected def withNewChildInternal(c: Expression): ClipFrameDctHashes =
    copy(child = c)
}

/** Sampled-frame statistics of an APNG payload — every `sampleEvery`-th
  * frame decoded through the real inflate + defilter path, channel sums
  * accumulated over the SAMPLED frames only: `(width, height, n_frames,
  * n_sampled, sum_r, sum_g, sum_b)`, NULL when the animation walk rejects
  * the bytes. The video-curation gate shape: frame-sample → features.
  */
case class ApngFrameStats(child: Expression, sampleEvery: Int)
    extends UnaryExpression with CodegenFallback {
  require(sampleEvery >= 1, s"sampleEvery must be >= 1: $sampleEvery")
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("n_frames", IntegerType), StructField("n_sampled", IntegerType),
    StructField("sum_r", LongType), StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  override def nullSafeEval(input: Any): Any =
    graft.llm.Multimodal.decodeApngFrames(input.asInstanceOf[Array[Byte]]) match {
      case None => null
      case Some(frames) =>
        val sums = new Array[Long](3)
        var sampled = 0
        var fi = 0
        while (fi < frames.size) {
          if (fi % sampleEvery == 0) {
            sampled += 1
            val img = frames(fi)
            val n = img.width * img.height
            var p = 0
            while (p < n) {
              var c = 0
              while (c < 3) {
                sums(c) += img.pixels(p * img.channels + c) & 0xFF; c += 1
              }
              p += 1
            }
          }
          fi += 1
        }
        val h = frames.head
        org.apache.spark.sql.catalyst.InternalRow(
          java.lang.Integer.valueOf(h.width), java.lang.Integer.valueOf(h.height),
          java.lang.Integer.valueOf(frames.size), java.lang.Integer.valueOf(sampled),
          java.lang.Long.valueOf(sums(0)), java.lang.Long.valueOf(sums(1)),
          java.lang.Long.valueOf(sums(2)))
    }

  override protected def withNewChildInternal(c: Expression): ApngFrameStats =
    copy(child = c)
}

/** Per-sampled-frame CONTENT hashes of an APNG payload —
  * `array<struct<frame_idx int, fhash long>>` over every `sampleEvery`-th
  * frame, where `fhash` is the base-31 mod 1e9+7 polynomial fold of
  * (width, height, channels, then every decoded pixel byte in raster
  * order). Two frames share a hash iff their decoded rasters are
  * identical (dimensions prefixed so equal-content different-shape
  * sequences cannot coincide), which is what clip-level dedup joins on.
  * NULL when the animation walk rejects the bytes.
  */
case class ApngFrameHashes(child: Expression, sampleEvery: Int)
    extends UnaryExpression with CodegenFallback {
  require(sampleEvery >= 1, s"sampleEvery must be >= 1: $sampleEvery")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("frame_idx", IntegerType), StructField("fhash", LongType))))

  override def nullSafeEval(input: Any): Any =
    graft.llm.Multimodal.decodeApngFrames(input.asInstanceOf[Array[Byte]]) match {
      case None => null
      case Some(frames) =>
        val P = 1000000007L
        val rows = frames.zipWithIndex.collect {
          case (img, fi) if fi % sampleEvery == 0 =>
            var h = ((img.width * 31L + img.height) * 31L + img.channels) % P
            var i = 0
            while (i < img.pixels.length) {
              h = (h * 31L + (img.pixels(i) & 0xFF)) % P
              i += 1
            }
            org.apache.spark.sql.catalyst.InternalRow(
              java.lang.Integer.valueOf(fi), java.lang.Long.valueOf(h))
        }
        new GenericArrayData(rows.toArray[Any])
    }

  override protected def withNewChildInternal(c: Expression): ApngFrameHashes =
    copy(child = c)
}

/** A REAL synthesized MJPEG clip from (width, height, nFrames, variant) —
  * [[graft.llm.Multimodal.encodeMjpeg]] with the per-frame pattern
  * `channel(f, x, y, c) = (7x + 13y + 101c + 16·((23f + variant) mod 16))
  * mod 256`: back-to-back genuine baseline JPEG streams from the JDK's
  * own encoder. The phase is COARSE (multiples of 16) on purpose: JPEG is
  * lossy, so two frames must differ by well more than the quantization
  * noise for "different phase ⇒ different decoded raster" to hold — which
  * is the invariant the clip-dedup oracle states. Equal (w, h, phase)
  * frames are byte-identical by construction (deterministic encoder),
  * hence raster-identical after decode.
  */
case class SyntheticMjpeg(first: Expression, second: Expression,
                          third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType

  override def nullSafeEval(w: Any, h: Any, n: Any, v: Any): Any = {
    val width = w.asInstanceOf[Number].intValue()
    val height = h.asInstanceOf[Number].intValue()
    val nFrames = n.asInstanceOf[Number].intValue()
    val variant = v.asInstanceOf[Number].intValue()
    graft.llm.Multimodal.encodeMjpeg(width, height, nFrames,
      (f, x, y, c) =>
        (7 * x + 13 * y + 101 * c + 16 * ((23 * f + variant) % 16)) % 256)
  }

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): SyntheticMjpeg =
    copy(first = a, second = b, third = c, fourth = d)
}

/** Per-sampled-frame CONTENT hashes of a CLIP payload, dispatching on the
  * container's magic bytes: PNG signature → the APNG frame walk, SOI
  * (FFD8) → the MJPEG split + baseline JPEG decode. Same hash as
  * [[ApngFrameHashes]] — base-31 mod 1e9+7 fold over (width, height,
  * channels, decoded raster bytes) — so mixed-container corpora dedup in
  * one relation: two frames share a hash iff their DECODED rasters are
  * identical, regardless of which container carried them. NULL when
  * neither walk accepts the bytes.
  */
case class ClipFrameHashes(child: Expression, sampleEvery: Int)
    extends UnaryExpression with CodegenFallback {
  require(sampleEvery >= 1, s"sampleEvery must be >= 1: $sampleEvery")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("frame_idx", IntegerType), StructField("fhash", LongType))))

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val frames =
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF &&
          (bytes(1) & 0xFF) == 0xD8)
        graft.llm.Multimodal.decodeMjpegFrames(bytes)
      else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == '8')
        // palette-resolved to RGB, so an equal-content APNG frame hashes
        // identically — container-blind clip dedup
        graft.llm.Multimodal.gifFramesAsRgb(bytes)
      else graft.llm.Multimodal.decodeApngFrames(bytes)
    frames match {
      case None => null
      case Some(fs) =>
        val P = 1000000007L
        val rows = fs.zipWithIndex.collect {
          case (img, fi) if fi % sampleEvery == 0 =>
            var h = ((img.width * 31L + img.height) * 31L + img.channels) % P
            var i = 0
            while (i < img.pixels.length) {
              h = (h * 31L + (img.pixels(i) & 0xFF)) % P
              i += 1
            }
            org.apache.spark.sql.catalyst.InternalRow(
              java.lang.Integer.valueOf(fi), java.lang.Long.valueOf(h))
        }
        new GenericArrayData(rows.toArray[Any])
    }
  }

  override protected def withNewChildInternal(c: Expression): ClipFrameHashes =
    copy(child = c)
}

/** The IMA-ADPCM end-to-end probe: synthesize a deterministic triangle
  * wave from (nSamples, variant) — `p = 64 + (variant mod 64)`, `s(i) =
  * 256·(p − |i mod 2p − p|) − 128p`, slopes of ±256 the step table must
  * track — encode it through the REAL [[graft.llm.Multimodal.encodeWavAdpcm]]
  * container, decode it back through the real chunk walk + block decode,
  * and release the EXACT invariants of a lossy-but-integer-deterministic
  * codec: `(sample_rate, channels, n_samples, n_exact_heads, err_ok)`.
  * `n_exact_heads` counts block-boundary samples reproduced EXACTLY (the
  * format stores each block's first sample verbatim in its header — a
  * layout or resync slip loses them); `err_ok` pins the tracking-error
  * contract (max |decoded − original| ≤ 4096, far above the adapted-step
  * bound for these slopes but fatal to any mis-stepped decoder, whose
  * error explodes to full scale). NULL when the decode rejects the bytes.
  */
case class AdpcmProbe(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
    StructField("n_samples", LongType), StructField("n_exact_heads", IntegerType),
    StructField("err_ok", BooleanType)))

  override def nullSafeEval(n: Any, v: Any): Any = {
    val nSamples = n.asInstanceOf[Number].intValue()
    val variant = v.asInstanceOf[Number].intValue()
    val p = 64 + (variant % 64)
    def s(i: Int): Short = {
      val ph = i % (2 * p)
      (256 * (p - math.abs(ph - p)) - 128 * p).toShort
    }
    val samples = Array.tabulate(nSamples)(s)
    val wav = graft.llm.Multimodal.encodeWavAdpcm(16000, samples)
    graft.llm.Multimodal.decodeWav(wav) match {
      case None => null
      case Some(a) =>
        val spb = graft.llm.Adpcm.samplesPerBlock(256)
        var heads = 0
        var k = 0
        while (k * spb < a.samples.length) {
          if (a.samples(k * spb) == s(k * spb)) heads += 1
          k += 1
        }
        var maxErr = 0
        var i = 0
        while (i < math.min(a.samples.length, nSamples)) {
          val e = math.abs(a.samples(i) - s(i))
          if (e > maxErr) maxErr = e
          i += 1
        }
        org.apache.spark.sql.catalyst.InternalRow(
          java.lang.Integer.valueOf(a.sampleRate),
          java.lang.Integer.valueOf(a.channels),
          java.lang.Long.valueOf(a.samples.length.toLong),
          java.lang.Integer.valueOf(heads),
          java.lang.Boolean.valueOf(maxErr <= 4096))
    }
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): AdpcmProbe = copy(left = l, right = r)
}

/** 10⁻³-unit quantization of an array<float|double> vector —
  * `array<double>` whose entries are the EXACT integers
  * floor(x·1000 + 0.5). The covariance/PCA pipeline sums these (and
  * their pairwise products) instead of raw floats, so the sufficient
  * statistics are order-invariant and bit-identical cross-engine — the
  * vector twin of the cents-exact t-test convention.
  */
case class QuantMillis(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    // input must already be array<double> (cast array<float> upstream
    // once — the DotProductD convention)
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(arr.getDouble(i) * 1000 + 0.5)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): QuantMillis =
    copy(child = c)
}

/** Flattened upper-triangle outer product of the 10⁻³-quantized vector —
  * `array<double>` of the d(d+1)/2 exact integer products qᵢ·qⱼ (i ≤ j,
  * row-major). One [[VectorSumD]] aggregate over this column yields the
  * full second-moment matrix in a single map-side-combined pass: the
  * covariance of a 100 TB embedding table costs one scan + one exchange
  * of d(d+1)/2 doubles per task.
  */
case class OuterProductMillis(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    // array<double> input required (cast upstream, as QuantMillis)
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val q = new Array[Double](n)
    var i = 0
    while (i < n) {
      q(i) = math.floor(arr.getDouble(i) * 1000 + 0.5)
      i += 1
    }
    val out = new Array[Double](n * (n + 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i
      while (j < n) { out(k) = q(i) * q(j); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): OuterProductMillis =
    copy(child = c)
}

/** The DISTINCT strings reachable by deleting up to `maxDel` (0–2)
  * characters — the SymSpell-style deletion neighborhood that powers
  * [[graft.llm.Dedup.fuzzyPairs]]'s candidate generation. Character-indexed
  * (UTF8String.substring), matching `levenshtein`'s code-point semantics.
  * Distinctness matters for cost, not correctness: deleting different
  * positions of a same-character run yields the same string, and every
  * duplicate multiplies the candidate join fan-out. The interpreted
  * transform/sequence/substr equivalent measured ~6 µs per variant at
  * sf0.1 — the dominant cost of the whole query; this kernel builds the
  * byte slices directly.
  */
case class DeletionNeighborhood(child: Expression, maxDel: Int)
    extends UnaryExpression with CodegenFallback {
  require(maxDel >= 0 && maxDel <= 2, s"maxDel in [0, 2], got $maxDel")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val L = s.numChars()
    val cap = 1 + L + (if (maxDel >= 2) L * (L - 1) / 2 else 0)
    val seen = new java.util.HashSet[UTF8String](cap * 2)
    val out = new java.util.ArrayList[AnyRef](cap)
    def add(v: UTF8String): Unit = if (seen.add(v)) { out.add(v); () }
    add(s)
    if (maxDel >= 1) {
      var i = 0
      while (i < L) {
        add(UTF8String.concat(s.substring(0, i), s.substring(i + 1, L)))
        i += 1
      }
    }
    if (maxDel >= 2) {
      var i = 0
      while (i < L) {
        var j = i + 1
        while (j < L) {
          add(UTF8String.concat(s.substring(0, i), s.substring(i + 1, j),
            s.substring(j + 1, L)))
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): DeletionNeighborhood =
    copy(child = c)
}

/** Column-level entry points (Spark 4's unified Column wraps/unwraps
  * catalyst expressions via ExpressionUtils).
  */
object native {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def simhash60(c: Column): Column = column(SimHash60(expression(c)))
  def deletionNeighborhood(c: Column, maxDel: Int): Column =
    column(DeletionNeighborhood(expression(c), maxDel))
  def wordShingles(c: Column, n: Int): Column = column(WordShingles(expression(c), n))
  def wordGrams(c: Column, n: Int): Column = column(WordGrams(expression(c), n))

  /** Doc-local repetition char counts; array laid out top-orders then
    * dup-orders (see [[GramRepetition]]).
    */
  def gramRepetition(toks: Column, topOrders: Seq[Int],
                     dupOrders: Seq[Int]): Column =
    column(GramRepetition(expression(toks), topOrders, dupOrders))

  /** `[Σ round(c·log2(c)·1e6), n_distinct]` of a token array (see
    * [[TokenEntropyMicro]]).
    */
  def tokenEntropyMicro(toks: Column): Column =
    column(TokenEntropyMicro(expression(toks)))

  /** Deflate-compressed byte count of a string (see [[DeflateSize]]). */
  def deflateSize(text: Column, level: Int = 6): Column =
    column(DeflateSize(expression(text), level))

  /** Content-defined chunks `array<struct<idx, start, len, hash>>` of a
    * text column (see [[CdcChunks]]).
    */
  def cdcChunks(text: Column, w: Int, divisor: Long): Column =
    column(CdcChunks(expression(text), w, divisor))

  /** Integer micro-unit random-sign projection of an array<double> vector
    * (see [[RandomSignProject]]).
    */
  def randomSignProject(vec: Column, outDim: Int): Column =
    column(RandomSignProject(expression(vec), outDim))
  def lshKey(c: Column, nBits: Int): Column = column(HyperplaneLshKey(expression(c), nBits))
  def winnowFps(toks: Column, k: Int, w: Int): Column =
    column(WinnowFingerprints(expression(toks), k, w))
  def minhashSig(c: Column, numHashes: Int): Column =
    column(MinHashSig(expression(c), numHashes))

  /** Inputs must already be array<double> (cast array<float> upstream once). */
  def dotd(a: Column, b: Column): Column =
    column(DotProductD(expression(a), expression(b)))

  /** Order-preserving long image of a DOUBLE column (see [[SortableDoubleBits]]). */
  def sortableBits(c: Column): Column = column(SortableDoubleBits(expression(c)))

  /** One-pass distinct Jaccard of two array<string> columns. */
  def jaccardSim(a: Column, b: Column): Column =
    column(JaccardSim(expression(a), expression(b)))

  /** BPE token count of a text column under a fixed merge table. */
  def bpeCount(c: Column, merges: Seq[(String, String)]): Column =
    column(BpeCount(expression(c), merges))

  /** The full BPE token sequence (array<string>, document order). */
  def bpeTokens(c: Column, merges: Seq[(String, String)]): Column =
    column(BpeTokens(expression(c), merges))

  /** Unigram-LM `(n_pieces, cost)` stats under a vocab artifact. */
  def unigramStats(c: Column, v: graft.llm.Unigram.Vocab): Column =
    column(UnigramStats(expression(c), v.costs.toSeq.sortBy(_._1),
      v.total, v.maxLen))

  /** Unigram-LM Viterbi piece sequence (array<string>, document order). */
  def unigramPieces(c: Column, v: graft.llm.Unigram.Vocab): Column =
    column(UnigramPieces(expression(c), v.costs.toSeq.sortBy(_._1),
      v.total, v.maxLen))

  /** `(clean_text, n_removed)` after cutting k-token windows at `starts`. */
  def removeCoveredSpans(toks: Column, starts: Column, k: Int): Column =
    column(RemoveCoveredSpans(expression(toks), expression(starts), k))

  /** Total Aho–Corasick occurrences of any pattern in a text column. */
  def multiPatternCount(c: Column, patterns: Seq[String]): Column =
    column(MultiPatternCount(expression(c), patterns))

  /** Hashed-BoW logistic quality score under a model artifact. */
  def qualityModelScore(c: Column, m: graft.llm.QualityModel.Model): Column =
    column(QualityScore(expression(c), m.weights.toSeq, m.bias))

  /** `(format, width, height)` header parse of a binary image payload. */
  def imageMeta(c: Column): Column = column(ImageMeta(expression(c)))

  /** A real synthesized PNG from (width, height, variant). */
  def syntheticPng(w: Column, h: Column, v: Column): Column =
    column(SyntheticPng(expression(w), expression(h), expression(v)))

  /** Gradient-pattern PNG (see [[SyntheticPngGrad]]). */
  def syntheticPngGrad(imgW: Int, imgH: Int, a: Column, b: Column,
      shift: Column): Column =
    column(SyntheticPngGrad(imgW, imgH, expression(a), expression(b),
      expression(shift)))

  /** 64-bit average-hash of a decoded PNG/JPEG raster (see [[ImageAHash64]]). */
  def imageAHash64(c: Column): Column = column(ImageAHash64(expression(c)))

  /** 64-bit DCT perceptual hash of a decoded PNG/JPEG raster (see
    * [[ImageDctHash64]]).
    */
  def imageDctHash64(c: Column): Column = column(ImageDctHash64(expression(c)))

  /** Margin-engineered checkerboard image, PNG or JPEG (see
    * [[SyntheticImageCheck]]).
    */
  def syntheticImageCheck(imgW: Int, imgH: Int, group: Column,
      jpeg: Column): Column =
    column(SyntheticImageCheck(imgW, imgH, expression(group), expression(jpeg)))

  /** Decoded-pixel stats `(width, height, channels, sum_r, sum_g, sum_b)`. */
  def pngPixelStats(c: Column): Column = column(PngPixelStats(expression(c)))

  /** A real synthesized GIF89a from (width, height, variant). */
  def syntheticGif(w: Column, h: Column, v: Column): Column =
    column(SyntheticGif(expression(w), expression(h), expression(v)))

  /** GIF decoded-pixel stats `(width, height, sum_r, sum_g, sum_b)`. */
  def gifPixelStats(c: Column): Column = column(GifPixelStats(expression(c)))

  /** A real synthesized ANIMATED GIF from (w, h, nFrames, variant);
    * `frameStep` 23 matches [[SyntheticApng]]'s raster frame-for-frame.
    */
  def syntheticGifAnim(w: Column, h: Column, n: Column, v: Column,
                       frameStep: Int = 31): Column =
    column(SyntheticGifAnim(frameStep, expression(w), expression(h),
      expression(n), expression(v)))

  /** The checkerboard gate image through the GIF codec (see
    * [[SyntheticImageCheckGif]]).
    */
  def syntheticImageCheckGif(imgW: Int, imgH: Int, group: Column): Column =
    column(SyntheticImageCheckGif(imgW, imgH, expression(group)))

  /** A real synthesized 16-bit PCM WAV from (nSamples, variant). */
  /** Gain-scaled synthetic WAV from (nSamples, variant, gain). */
  def syntheticWavGain(n: Column, v: Column, g: Column): Column =
    column(SyntheticWavGain(expression(n), expression(v), expression(g)))

  /** Spectral-peak landmark shingle hashes of decoded PCM (see
    * [[WavSpectralHashes]]).
    */
  def wavSpectralHashes(c: Column, window: Int = 64, shingle: Int = 4): Column =
    column(WavSpectralHashes(expression(c), window, shingle))

  /** Per-window decoded-PCM content hashes (see [[WavWindowHashes]]). */
  def wavWindowHashes(c: Column, window: Int): Column =
    column(WavWindowHashes(expression(c), window))

  /** Synthesized IMA-ADPCM WAVE clip (see [[SyntheticWavAdpcm]]). */
  def syntheticWavAdpcm(n: Column, v: Column): Column =
    column(SyntheticWavAdpcm(expression(n), expression(v)))

  def syntheticWav(n: Column, v: Column): Column =
    column(SyntheticWav(expression(n), expression(v)))

  /** A real synthesized APNG clip from (width, height, nFrames, variant). */
  def syntheticApng(w: Column, h: Column, n: Column, v: Column): Column =
    column(SyntheticApng(expression(w), expression(h), expression(n), expression(v)))

  /** Gradient-frame APNG with a per-clip brightness shift (see
    * [[SyntheticApngGrad]]).
    */
  def syntheticApngGrad(imgW: Int, imgH: Int, nFrames: Column, group: Column,
      shift: Column): Column =
    column(SyntheticApngGrad(imgW, imgH, expression(nFrames),
      expression(group), expression(shift)))

  /** Per-sampled-frame DCT perceptual hashes of a video payload (see
    * [[ClipFrameDctHashes]]).
    */
  def clipFrameDctHashes(c: Column, sampleEvery: Int): Column =
    column(ClipFrameDctHashes(expression(c), sampleEvery))

  /** Sampled-frame stats of an APNG payload (every `sampleEvery`-th frame). */
  def apngFrameStats(c: Column, sampleEvery: Int): Column =
    column(ApngFrameStats(expression(c), sampleEvery))

  /** Sampled-frame content hashes `array<(frame_idx, fhash)>` of an APNG. */
  def apngFrameHashes(c: Column, sampleEvery: Int): Column =
    column(ApngFrameHashes(expression(c), sampleEvery))

  /** A real synthesized MJPEG clip from (width, height, nFrames, variant). */
  def syntheticMjpeg(w: Column, h: Column, n: Column, v: Column): Column =
    column(SyntheticMjpeg(expression(w), expression(h), expression(n), expression(v)))

  /** Container-dispatching sampled-frame content hashes (APNG or MJPEG). */
  def clipFrameHashes(c: Column, sampleEvery: Int): Column =
    column(ClipFrameHashes(expression(c), sampleEvery))

  /** IMA-ADPCM synthesize→encode→decode probe `(sample_rate, channels,
    * n_samples, n_exact_heads, err_ok)`. */
  def adpcmProbe(n: Column, v: Column): Column =
    column(AdpcmProbe(expression(n), expression(v)))

  /** Decoded-PCM stats `(sample_rate, channels, n_samples, sum_sq, n_zero_cross, peak)`. */
  def wavAudioStats(c: Column): Column = column(WavAudioStats(expression(c)))

  /** Per-doc micro-unit logistic gradient contributions under a model. */
  def qualityGrad(text: Column, label: Column,
                  m: graft.llm.QualityModel.Model): Column =
    column(QualityGrad(expression(text), expression(label),
      m.weights.toSeq, m.bias))

  /** Aggregate: elementwise sum of array<double> vectors (map-side combined). */
  def vecsum(c: Column): Column =
    column(VectorSumD(expression(c)).toAggregateExpression())

  /** 10⁻³-unit exact quantization of an array<double> vector. */
  def quantMillis(c: Column): Column = column(QuantMillis(expression(c)))

  /** Upper-triangle outer product of the 10⁻³-quantized vector. */
  def outerProductMillis(c: Column): Column =
    column(OuterProductMillis(expression(c)))

  /** Int8 quantization of an array<float|double> vector (+ its scale). */
  def int8quant(c: Column): Column = column(Int8Quantize(expression(c)))
  def int8scale(c: Column): Column = column(Int8Scale(expression(c)))

  /** Aggregate: OR-fold an array<string> column into an mBits bloom bitmap
    * (array<long>, map-side combined, constant shuffle width).
    */
  def bloomBits(c: Column, mBits: Int, k: Int): Column =
    column(BloomBitsAgg(expression(c), mBits, k).toAggregateExpression())

  /** Count of array<string> items whose k probe positions are all set. */
  def bloomCountHits(bits: Column, items: Column, mBits: Int, k: Int): Column =
    column(BloomCountHits(expression(bits), expression(items), mBits, k))

  /** Aggregate: KMV distinct-count estimate of a non-negative LONG column
    * (k-minima state, map-side combined, cross-engine deterministic).
    */
  def kmvDistinct(c: Column, k: Int, seed: Long = 42L): Column =
    column(KmvDistinctAgg(expression(c), k, seed).toAggregateExpression())

  /** Aggregate: the raw ascending k-minima array — the composable sketch
    * form for theta-style set-operation estimates.
    */
  def kmvMinima(c: Column, k: Int, seed: Long = 42L): Column =
    column(KmvMinimaAgg(expression(c), k, seed).toAggregateExpression())
}
