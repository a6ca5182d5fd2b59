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
}
