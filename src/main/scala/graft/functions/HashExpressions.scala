package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Primitive kernels for the dedup signatures, callable from generated
  * code (Scala objects emit static forwarders). Shared constants with
  * `graft.dedup.Dedup`. */
object HashKernels {
  val NumPerm = 128
  val Bands = 32
  val RowsPerBand: Int = NumPerm / Bands

  /** Deterministic universal-hash permutation params (a odd => bijection
    * over the 2^64 ring). */
  val permA: Array[Long] = {
    val r = new scala.util.Random(42)
    Array.fill(NumPerm)(r.nextLong() | 1L)
  }
  val permB: Array[Long] = {
    val r = new scala.util.Random(43)
    Array.fill(NumPerm)(r.nextLong())
  }

  /** MinHash signature folded into per-band hashes in one pass over the
    * shingle set: sig[p] = min over h of h*a[p]+b[p]; band hash = FNV-ish
    * fold of its signature slice. Input: hashed shingle set. */
  def minhashBands(arr: ArrayData): ArrayData = {
    val hs = arr.toLongArray()
    val sig = new Array[Long](NumPerm)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var p = 0
      while (p < NumPerm) {
        val v = h * permA(p) + permB(p)
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    val out = new Array[Long](Bands)
    var b = 0
    while (b < Bands) {
      var acc = 1125899906842597L
      var j = b * RowsPerBand
      while (j < (b + 1) * RowsPerBand) { acc = acc * 31 + sig(j); j += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  // ---- portable (cross-engine checkable) MinHash ---------------------------

  /** Mod-p arithmetic for the cross-engine MinHash: every intermediate
    * stays far below 2^63 (a, b, h < p ≈ 1e9 ⇒ a*h < 1e18), so DuckDB —
    * which raises on BIGINT overflow instead of wrapping — computes the
    * identical signature. `minhashBands` (the scale path) keeps its 2^64
    * ring; this spelling exists so the sketch PIPELINE (shingling →
    * hashing → permutation → min) is oracle-checkable bit-for-bit. */
  val PortP = 1000000007L
  val PortPerm = 16
  val portA: Array[Long] = Array(
    127904007L, 539572183L, 694923750L, 110205474L, 239749961L, 645351752L,
    597600699L, 841140766L, 588208070L, 784410271L, 824757552L, 806407984L,
    629771962L, 257627257L, 659496828L, 118902462L)
  val portB: Array[Long] = Array(
    343043868L, 549565454L, 923418596L, 949316402L, 960791840L, 667313473L,
    451631864L, 614791075L, 904521971L, 833838458L, 527104586L, 830080574L,
    473622146L, 2721764L, 86676380L, 308421828L)

  /** 31-ary codepoint fold of `s` onto `h0`, mod p — the DuckDB spelling
    * `list_reduce(list_transform(range(1, len(g)+1), i -> unicode(g[i])),
    * (a, b) -> (a*31+b) % p)`: list_reduce seeds with the first element,
    * which equals seeding 0 here because (0*31 + cp) % p = cp. Iterates
    * by codepoint (surrogate pairs advance once), matching DuckDB's
    * per-character indexing. */
  private def portFold(h0: Long, s: String): Long = {
    var h = h0
    var k = 0
    while (k < s.length) {
      val cp = s.codePointAt(k)
      h = (h * 31 + cp) % PortP
      k += Character.charCount(cp)
    }
    h
  }

  /** Portable MinHash over word-3-gram shingles (whole-doc gram when
    * fewer than 3 tokens, same fallback as `shingles3`): per gram, hash
    * via [[portFold]] WITHOUT materializing the joined string (separator
    * codepoints fold through), then take the per-permutation min of
    * (a*h + b) % p. Min is duplicate-insensitive, so no shingle dedup is
    * needed for equality with the distinct-shingle spelling. */
  def minhashPortable(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      i += 1
    }
    val out = new Array[Long](PortPerm)
    java.util.Arrays.fill(out, Long.MaxValue)
    def update(h: Long): Unit = {
      var p = 0
      while (p < PortPerm) {
        val v = (portA(p) * h + portB(p)) % PortP
        if (v < out(p)) out(p) = v
        p += 1
      }
    }
    if (n >= 3) {
      var j = 0
      while (j + 2 < n) {
        var h = portFold(0L, toks(j))
        h = (h * 31 + ' ') % PortP
        h = portFold(h, toks(j + 1))
        h = (h * 31 + ' ') % PortP
        h = portFold(h, toks(j + 2))
        update(h)
        j += 1
      }
    } else {
      var h = 0L
      var j = 0
      while (j < n) {
        if (j > 0) h = (h * 31 + ' ') % PortP
        h = portFold(h, toks(j))
        j += 1
      }
      update(h)
    }
    new GenericArrayData(out)
  }

  private val Xx64Seed = 42L // xxhash64()'s SQL default seed

  /** Word-3-gram shingling + xxhash64 + first-occurrence dedup in ONE
    * native pass: exactly `array_distinct(transform(..., i ->
    * xxhash64(concat_ws(' ', tok[i], tok[i+1], tok[i+2]))))` (whole-doc
    * gram when fewer than 3 tokens), but without the interpreted
    * higher-order-function fallback — gram bytes are assembled in a
    * reused buffer and hashed with Spark's own XXH64, so the equality
    * with the SQL spelling is byte-exact. Null token slots are skipped
    * the way `concat_ws` skips them (no text, no separator) — split()
    * never produces them, but the function is SQL-registered and
    * user-reachable with e.g. `shingles3(array('a', NULL))`. */
  def shingles3(arr: ArrayData): ArrayData = {
    import org.apache.spark.unsafe.Platform
    val n = arr.numElements()
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    var total = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (toks(i) != null) total += toks(i).numBytes
      i += 1
    }
    def hashJoined(from: Int, count: Int, buf: Array[Byte]): Long = {
      var off = 0
      var wrote = false
      var j = from
      while (j < from + count) {
        if (toks(j) != null) {
          // separator decision must be value-based like concat_ws: an
          // empty-string token writes 0 bytes but still earns a separator
          if (wrote) { buf(off) = ' '; off += 1 }
          toks(j).writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + off)
          off += toks(j).numBytes
          wrote = true
        }
        j += 1
      }
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, off, Xx64Seed)
    }
    if (n < 3) {
      val buf = new Array[Byte](total + math.max(n - 1, 0))
      return new GenericArrayData(Array(hashJoined(0, n, buf)))
    }
    val out = new Array[Long](n - 2)
    val seen = new java.util.HashSet[java.lang.Long]()
    var buf = new Array[Byte](64)
    var m = 0
    i = 0
    while (i <= n - 3) {
      var need = 2
      var j = i
      while (j < i + 3) { if (toks(j) != null) need += toks(j).numBytes; j += 1 }
      if (buf.length < need) buf = new Array[Byte](math.max(need, buf.length * 2))
      val h = hashJoined(i, 3, buf)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** Language-ID stopword lists (single source of truth — the SQL
    * spellings in `graft.text.TextAnalysis` and the DuckDB oracle are
    * derived from these). Order: en, de, fr, es. A token may belong to
    * more than one list (`que`/`un` are fr+es), so membership is a
    * bitmask, not a single label. */
  val stopwordLists: Array[Array[String]] = Array(
    Array("the", "and", "of", "to", "in", "is", "that", "it", "for", "on", "with", "as"),
    Array("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den", "von", "im"),
    Array("le", "les", "et", "un", "une", "est", "pour", "dans", "que", "pas", "au", "sur"),
    Array("el", "los", "las", "y", "en", "que", "un", "una", "es", "por", "con", "para"))

  private val stopwordMask: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
    var lang = 0
    while (lang < stopwordLists.length) {
      for (w <- stopwordLists(lang)) {
        val k = org.apache.spark.unsafe.types.UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << lang)))
      }
      lang += 1
    }
    m
  }

  /** Per-language stopword hit counts in ONE native pass over the token
    * array: exactly `size(filter(tok, x -> array_contains(array(<lang
    * list>), x)))` for each of en/de/fr/es, but one hash probe per token
    * instead of four interpreted lambda evaluations × 12-way
    * array_contains scans. Null tokens count for no language (the HOF
    * spelling drops them too: `array_contains(..., NULL)` is NULL, and
    * `filter` keeps only true). Returns [en, de, fr, es]. */
  def stopwordHits(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val counts = new Array[Long](stopwordLists.length)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val m = stopwordMask.get(arr.getUTF8String(i))
        if (m != null) {
          val bits = m.intValue()
          var lang = 0
          while (lang < counts.length) {
            if ((bits & (1 << lang)) != 0) counts(lang) += 1
            lang += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Cross-engine 60-bit SimHash over word-3-gram shingles (the
    * `dedup_minhash_sig` pattern applied to SimHash): grams hash via the
    * same mod-p polynomial fold as [[minhashPortable]], are DEDUPED
    * (SimHash counts distinct shingles), and — because a mod-p hash only
    * carries ~30 well-mixed bits — signature bit b (p = b/4, k = b%4) is
    * the majority sign of bit k of affine permutation p over the distinct
    * grams. 15 permutations × 4 low bits = 60 bits, keeping the
    * signature positive in a BIGINT in both engines. Bit-identical to
    * the DuckDB spelling in `Dedup.simhashSigDuckSql`. */
  val PortSimBits = 60

  def simhashPortable(arr: ArrayData): Long = {
    val n = arr.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      i += 1
    }
    val grams = new java.util.HashSet[java.lang.Long]()
    if (n >= 3) {
      var j = 0
      while (j + 2 < n) {
        var h = portFold(0L, toks(j))
        h = (h * 31 + ' ') % PortP
        h = portFold(h, toks(j + 1))
        h = (h * 31 + ' ') % PortP
        h = portFold(h, toks(j + 2))
        grams.add(h)
        j += 1
      }
    } else {
      var h = 0L
      var j = 0
      while (j < n) {
        if (j > 0) h = (h * 31 + ' ') % PortP
        h = portFold(h, toks(j))
        j += 1
      }
      grams.add(h)
    }
    val acc = new Array[Int](PortSimBits)
    val it = grams.iterator()
    while (it.hasNext) {
      val h = it.next().longValue()
      var p = 0
      while (p < PortSimBits / 4) {
        val v = (portA(p) * h + portB(p)) % PortP
        var k = 0
        while (k < 4) {
          if (((v >> k) & 1L) == 1L) acc(p * 4 + k) += 1
          else acc(p * 4 + k) -= 1
          k += 1
        }
        p += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < PortSimBits) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** 64-bit SimHash over the hashed shingle set. */
  def simhash64(arr: ArrayData): Long = {
    val hs = arr.toLongArray()
    val acc = new Array[Int](64)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (acc(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }
}

/** `minhash_portable(tok)` — cross-engine mod-p MinHash signature (16
  * minima) over word-3-gram shingles; bit-identical to the DuckDB
  * list_reduce/list_transform spelling (see [[HashKernels.portFold]]),
  * so the whole sketch pipeline is oracle-checkable. */
case class MinHashPortable(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.StringType
  override def prettyName: String = "minhash_portable"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashPortable(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.minhashPortable($c);")
  override protected def withNewChildInternal(newChild: Expression): MinHashPortable =
    copy(child = newChild)
}

private[functions] trait LongArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} requires array<bigint>, got ${t.simpleString}")
  }
}

/** `minhash_bands(hset)` — MinHash signature + LSH band hashes in one
  * native pass (no per-element boxing; stays inside whole-stage codegen
  * via a static kernel call). */
case class MinHashBands(child: Expression)
    extends UnaryExpression with LongArrayInput {
  override def prettyName: String = "minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashBands(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.minhashBands($c);")
  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** `simhash_portable(tok)` — cross-engine 60-bit SimHash signature over
  * word-3-gram shingles; bit-identical to the DuckDB mod-p spelling (see
  * [[HashKernels.simhashPortable]]), so the SimHash dedup pipeline is
  * oracle-checkable end to end. */
case class SimHashPortable(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.StringType
  override def prettyName: String = "simhash_portable"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    HashKernels.simhashPortable(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.simhashPortable($c);")
  override protected def withNewChildInternal(newChild: Expression): SimHashPortable =
    copy(child = newChild)
}

/** `simhash64(hset)` — 64-bit SimHash signature, native pass. */
case class SimHash64(child: Expression)
    extends UnaryExpression with LongArrayInput {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashKernels.simhash64(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.simhash64($c);")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `stopword_hits(tok)` — per-language stopword hit counts [en, de, fr,
  * es] in one native codegen pass: count-exact with the four-lambda SQL
  * spelling `size(filter(tok, x -> array_contains(array(...), x)))` but
  * one hash probe per token instead of four interpreted
  * (CodegenFallback) lambda walks. */
case class StopwordHits(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.StringType
  override def prettyName: String = "stopword_hits"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    HashKernels.stopwordHits(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.stopwordHits($c);")
  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

/** `shingles3(tok)` — word-3-gram shingle + xxhash64 + dedup in one
  * native codegen pass over the token array (the map-side front of every
  * dedup signature); byte-exact with the SQL spelling
  * `array_distinct(transform(..., xxhash64(concat_ws(' ', ...))))`. */
case class Shingles3(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.StringType
  override def prettyName: String = "shingles3"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    HashKernels.shingles3(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.shingles3($c);")
  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}
