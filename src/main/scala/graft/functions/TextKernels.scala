package graft.functions

import java.text.Normalizer

import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels referenced from codegen'd Catalyst expressions (static call
  * sites keep the expressions inside whole-stage codegen). */
object TextKernels {

  /** F1: NFKD-normalize then strip everything non-ASCII — the reference's
    * ingest fallback `unicodedata.normalize('NFKD', d).encode('ascii',
    * 'ignore')` (graph_db_builder.py:521-527): accents fold to base letters
    * ("Café" → "Cafe"), characters with no ASCII decomposition (CJK, emoji)
    * are dropped. */
  def asciiFoldString(s: String): String = {
    val norm = Normalizer.normalize(s, Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(norm.length)
    var i = 0
    while (i < norm.length) {
      val c = norm.charAt(i)
      if (c < 0x80) sb.append(c)
      i += 1
    }
    sb.toString
  }

  def asciiFold(s: UTF8String): UTF8String = {
    // Fast path: pure-ASCII input (the overwhelmingly common case) needs no
    // normalization and no allocation beyond the check.
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { if ((s.getByte(i) & 0x80) != 0) ascii = false; i += 1 }
    if (ascii) s else UTF8String.fromString(asciiFoldString(s.toString))
  }

  /** Whitespace-token n-gram shingles: trim → split on \s+ → join each
    * window of `n` tokens with a single space. Texts with fewer than `n`
    * tokens yield an empty array. Kernel for the codegen'd
    * [[TokenShingles]] expression. */
  def shingles(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = s.toString.trim.split("\\s+")
    val count = toks.length - n + 1
    if (count <= 0) {
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    } else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** 64-bit polynomial rolling hash (Rabin–Karp style) over the raw bytes —
    * the document-fingerprint kernel. Deterministic, order-sensitive. */
  def fingerprint64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L // large prime seed
    var i = 0
    while (i < bytes.length) {
      h = 31L * h + (bytes(i) & 0xff)
      i += 1
    }
    h
  }

  /** One-pass MinHash kernel: materialize each token n-gram shingle once
    * (same trim/split/join semantics as [[shingles]]), then fold it into
    * all `k` seeded minimums — seed_i = XXH64(i, 42), shingle hash =
    * XXH64 bytes-continuation, bit-identical to
    * `min(xxhash64(lit(i), shingle))` over the exploded shingle stream.
    * Returns an empty array when the text has fewer than `n` tokens
    * (callers filter those rows out, matching the aggregation
    * formulation where such docs simply produced no group). */
  def minhashSignature(s: UTF8String, n: Int,
      k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    // Tokenize with regex \s only (the exact delimiter set textProfile
    // counts with) — NOT String.trim, which also strips control chars
    // <= U+0020 and would disagree with the token-count pre-filter in
    // Dedup.minhashSignatures, producing empty signatures the filter
    // promised couldn't exist (an ANSI element_at crash downstream).
    val toks = s.toString.split("\\s+").filter(_.nonEmpty)
    val count = toks.length - n + 1
    if (count <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val seeds = new Array[Long](k)
    var i = 0
    while (i < k) {
      seeds(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashInt(i, 42L)
      i += 1
    }
    val mins = Array.fill(k)(Long.MaxValue)
    val sb = new java.lang.StringBuilder()
    var w = 0
    while (w < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(w + j))
        j += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var h = 0
      while (h < k) {
        val v = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            bytes.length, seeds(h))
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      mins.map(x => x: Any))
  }

  /** One-pass SimHash-64 kernel: scan the string's UTF-8 bytes for
    * whitespace-delimited tokens (ASCII ws bytes never occur inside
    * multi-byte code points, so the byte scan is UTF-8-safe), hash each
    * token in place with Spark's XXH64 (seed 42 — bit-identical to
    * `xxhash64(token)`), and accumulate the ±1 per-bit sums. Replaces an
    * explode → 64-column hash aggregation with a narrow per-row map: the
    * token stream never materializes and nothing shuffles. Fingerprints
    * match the aggregation formulation exactly for space-trimmed text
    * (boundary nuance: this kernel never emits empty tokens, where
    * `split(trim(s), "\\s+")` yields one for text starting with
    * non-space whitespace). */
  def simHash64(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    val counts = new Array[Int](64)
    var i = 0
    var start = -1
    while (i <= len) {
      val ws = i == len || {
        val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
        b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' ||
          b == '\r'
      }
      if (ws) {
        if (start >= 0) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(base, off + start, i - start, 42L)
          var b = 0
          while (b < 64) {
            counts(b) += (if (((h >>> b) & 1L) != 0L) 1 else -1)
            b += 1
          }
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  private val portableCoeffCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), Array[Long]]()

  /** One-pass PORTABLE MinHash kernel: same shingle walk as
    * [[minhashSignature]], but the shingle hash is the engine-portable
    * md5-48 mod 2^31−1 and the k minima run over the seed-derived
    * Carter–Wegman permutations ([[graft.operators.Dedup.portableCoeffs]]
    * — recomputed here from the same [[PortableHash.hash48]] primitives
    * and memoized, so the two can never drift). Bit-identical to the
    * explode + k-column min-aggregation formulation, as a narrow map.
    * Empty array when the text has fewer than `n` tokens. */
  def minhashSignaturePortable(s: UTF8String, n: Int, k: Int,
      seed: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    val P = 2147483647L
    val toks = s.toString.split("\\s+").filter(_.nonEmpty)
    val count = toks.length - n + 1
    if (count <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val coeffs = portableCoeffCache.computeIfAbsent((k, seed), { ks =>
      val out = new Array[Long](2 * ks._1)
      var i = 0
      while (i < ks._1) {
        out(2 * i) = PortableHash.hash48(s"a$i", ks._2) % (P - 1) + 1
        out(2 * i + 1) = PortableHash.hash48(s"b$i", ks._2) % P
        i += 1
      }
      out
    })
    val mins = Array.fill(k)(Long.MaxValue)
    val sb = new java.lang.StringBuilder()
    var w = 0
    while (w < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(w + j))
        j += 1
      }
      val h = PortableHash.hash48(sb.toString, seed) % P
      var i = 0
      while (i < k) {
        val v = (h * coeffs(2 * i) + coeffs(2 * i + 1)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      mins.map(x => x: Any))
  }

  /** One-pass PORTABLE SimHash-48 kernel: same whitespace byte scan as
    * [[simHash64]], but each token hashes with the engine-portable md5-48
    * ([[PortableHash.hash48]] — bit-identical to the column form, so the
    * DuckDB oracle can rebuild every fingerprint). Replaces the explode →
    * 48-column vote aggregation with a narrow map: the token stream never
    * materializes and nothing shuffles. Token set is identical to
    * `split(trim(s), "\\s+")` minus empties (the byte scan never emits
    * empty tokens). Token-less text → 0L. */
  def simHash48Portable(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    val counts = new Array[Int](48)
    var i = 0
    var start = -1
    while (i <= bytes.length) {
      val ws = i == bytes.length || {
        val b = bytes(i)
        b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' ||
          b == '\r'
      }
      if (ws) {
        if (start >= 0) {
          val tok = new String(bytes, start, i - start,
            java.nio.charset.StandardCharsets.UTF_8)
          val h = PortableHash.hash48(tok, seed)
          var b = 0
          while (b < 48) {
            counts(b) += (if (((h >>> b) & 1L) != 0L) 1 else -1)
            b += 1
          }
          start = -1
        }
      } else if (start < 0) start = i
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 48) {
      if (counts(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** English stopword list shared by the regex and kernel paths. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "it", "that", "this", "for", "on", "with", "as", "be", "by", "at")

  private val StopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    EnglishStopwords.foreach(s.add)
    s
  }

  /** One-pass text statistics kernel — the fused replacement for ~6
    * separate regex scans (token count, punct/upper counts, stopword hits,
    * BPE-ish piece count). Character classes replicate the Java-regex
    * semantics the original compositions used: `\s` is exactly
    * `[ \t\n\x0B\f\r]`, `\p{Punct}` and `[A-Z]`/alnum are ASCII. Iterates
    * by code point so astral characters count once (as regex `.` would).
    *
    * Returns struct(n_chars, n_tokens, n_nonws, n_punct, n_upper, n_stop,
    * n_bpeish) — all ints. */
  def textProfile(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val len = str.length
    var nChars, nTokens, nNonWs, nPunct, nUpper, nStop, nBpe = 0
    var inTok = false
    var inAlnum = false
    val tok = new java.lang.StringBuilder(16)
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      nChars += 1
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (ws) {
        if (inTok) {
          nTokens += 1
          if (StopSet.contains(tok.toString)) nStop += 1
          inTok = false
          tok.setLength(0)
        }
        inAlnum = false
      } else {
        nNonWs += 1
        if (!inTok) inTok = true
        tok.appendCodePoint(Character.toLowerCase(cp))
        val alnum = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
          (cp >= '0' && cp <= '9')
        if (alnum) {
          if (!inAlnum) { nBpe += 1; inAlnum = true }
        } else {
          nBpe += 1
          inAlnum = false
        }
        if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
          (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)) nPunct += 1
        if (cp >= 'A' && cp <= 'Z') nUpper += 1
      }
      i += Character.charCount(cp)
    }
    if (inTok) {
      nTokens += 1
      if (StopSet.contains(tok.toString)) nStop += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nChars, nTokens, nNonWs, nPunct, nUpper, nStop, nBpe))
  }
}
