package graft.core

/**
 * UTF-8 decoding with U+FFFD replacement, matching Python's
 * `bytes.decode("utf-8", errors="replace")` byte-for-byte.
 *
 * The reference decodes extracted node bytes exactly this way
 * (reference: utils/tree_sitter_helpers.py:253-258), so this is the
 * byte-identity-critical primitive (SURVEY.md §2.11, §7.4-1).
 *
 * CPython implements the WHATWG/Unicode "maximal subpart" rule: each
 * maximal subpart of an ill-formed sequence is replaced by exactly one
 * U+FFFD. We implement the same DFA with per-lead-byte continuation
 * ranges (rejects overlong forms, surrogates, and > U+10FFFF at the
 * first offending byte).
 */
object Utf8 {
  final val Replacement = '�'

  /** Decode `bytes[from, until)` to a String with replacement semantics. */
  def decodeReplace(bytes: Array[Byte], from: Int, until: Int): String = {
    // ASCII fast path (the overwhelmingly common case at corpus scale):
    // one latin-1 copy instead of per-char StringBuilder appends
    var p = from
    while (p < until && bytes(p) >= 0) p += 1
    if (p == until)
      return new String(bytes, from, until - from, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sb = new java.lang.StringBuilder(until - from)
    var i = from
    while (i < until) {
      val b0 = bytes(i) & 0xff
      if (b0 < 0x80) { sb.append(b0.toChar); i += 1 }
      else if (b0 < 0xc2) { sb.append(Replacement); i += 1 } // stray continuation or overlong lead
      else if (b0 < 0xe0) { // 2-byte
        if (i + 1 < until && isCont(bytes(i + 1))) {
          sb.append((((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f)).toChar); i += 2
        } else { sb.append(Replacement); i += 1 }
      } else if (b0 < 0xf0) { // 3-byte; lower bound varies to reject overlong + surrogates
        val lo = if (b0 == 0xe0) 0xa0 else 0x80
        val hi = if (b0 == 0xed) 0x9f else 0xbf
        if (i + 1 < until && inRange(bytes(i + 1), lo, hi)) {
          if (i + 2 < until && isCont(bytes(i + 2))) {
            val cp = ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
            sb.append(cp.toChar); i += 3
          } else { sb.append(Replacement); i += 2 } // maximal subpart = lead + 1 cont
        } else { sb.append(Replacement); i += 1 }
      } else if (b0 < 0xf5) { // 4-byte
        val lo = if (b0 == 0xf0) 0x90 else 0x80
        val hi = if (b0 == 0xf4) 0x8f else 0xbf
        if (i + 1 < until && inRange(bytes(i + 1), lo, hi)) {
          if (i + 2 < until && isCont(bytes(i + 2))) {
            if (i + 3 < until && isCont(bytes(i + 3))) {
              val cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
                ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
              sb.appendCodePoint(cp); i += 4
            } else { sb.append(Replacement); i += 3 }
          } else { sb.append(Replacement); i += 2 }
        } else { sb.append(Replacement); i += 1 }
      } else { sb.append(Replacement); i += 1 } // 0xf5-0xff never valid
    }
    sb.toString
  }

  def decodeReplace(bytes: Array[Byte]): String = decodeReplace(bytes, 0, bytes.length)

  @inline private def isCont(b: Byte): Boolean = (b & 0xc0) == 0x80
  @inline private def inRange(b: Byte, lo: Int, hi: Int): Boolean = {
    val v = b & 0xff; v >= lo && v <= hi
  }
}
