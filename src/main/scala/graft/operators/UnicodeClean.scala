package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the canonical pre-step before ANY
  * content hashing: exact dedup (row 44), MinHash shingles, line
  * dedup and fingerprinting all hash BYTES, and the same sentence
  * arrives from the web as NFC vs decomposed NFD, with typographic
  * quotes vs ASCII quotes, with zero-width joiners pasted invisibly —
  * byte-distinct, semantically identical. Normalizing first is the
  * difference between a dedup rate and a dedup lottery (CCNet, C4 and
  * Gopher all normalize before hashing).
  *
  * Deterministic, documented pipeline (one pass after NFC):
  *  1. NFC canonical composition (java.text.Normalizer — the W3C
  *     recommendation for content comparison);
  *  2. zero-width & BOM drop: U+200B/200C/200D/2060/FEFF;
  *  3. typographic folds: curly single quotes (U+2018/2019/201A/201B)
  *     → `'`, curly double quotes (U+201C/201D/201E/201F and
  *     guillemets U+00AB/00BB) → `"`, dashes (U+2010–2015, U+2212) →
  *     `-`, ellipsis (U+2026) → `...`;
  *  4. space folds: NBSP (U+00A0), NNBSP (U+202F), thin/em/en spaces
  *     (U+2000–200A), ideographic space (U+3000) → ASCII space;
  *  5. control strip: C0/C1 controls drop except `\n` and `\t`
  *     (`\r\n` and bare `\r` fold to `\n` first).
  *
  * Everything else (letters in any script, emoji, CJK) passes through
  * untouched — this is normalization, not ASCII-folding; language-ID
  * and tokenization still see the real text. Scan-side kernel, zero
  * shuffle, never throws; null in → null out. */
case class CleanText(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(UnicodeClean.clean(v.toString))

  override protected def withNewChildInternal(newChild: Expression)
      : CleanText = copy(child = newChild)
}

object UnicodeClean {

  private[graft] def clean(s: String): String = {
    val nfc =
      if (java.text.Normalizer.isNormalized(s,
        java.text.Normalizer.Form.NFC)) s
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    // fast path: pure printable-ASCII strings (most of a latin corpus
    // post-NFC) return as-is without a builder
    var i = 0
    var dirty = false
    while (!dirty && i < nfc.length) {
      val c = nfc.charAt(i)
      if (c < ' ' && c != '\n' && c != '\t') dirty = true
      else if (c >= 0x7F) dirty = true
      else i += 1
    }
    if (!dirty) return nfc
    val b = new java.lang.StringBuilder(nfc.length)
    b.append(nfc, 0, i)
    var k = i
    while (k < nfc.length) {
      val c = nfc.charAt(k)
      c match {
        case '\r' =>
          // \r\n folds to one \n; a bare \r becomes \n
          b.append('\n')
          if (k + 1 < nfc.length && nfc.charAt(k + 1) == '\n') k += 1
        case '\u200B' | '\u200C' | '\u200D' | '\u2060' | '\uFEFF' =>
          () // zero-width / BOM: drop
        case '\u2018' | '\u2019' | '\u201A' | '\u201B' =>
          b.append('\'')
        case '\u201C' | '\u201D' | '\u201E' | '\u201F' | '\u00AB' |
            '\u00BB' => b.append('"')
        case '\u2010' | '\u2011' | '\u2012' | '\u2013' | '\u2014' |
            '\u2015' | '\u2212' => b.append('-')
        case '\u2026' => b.append("...")
        case '\u00A0' | '\u202F' | '\u3000' => b.append(' ')
        case c2 if c2 >= '\u2000' && c2 <= '\u200A' => b.append(' ')
        case c2 if c2 < ' ' && c2 != '\n' && c2 != '\t' => () // C0 drop
        case c2 if c2 >= 0x7F && c2 <= 0x9F => () // DEL + C1 drop
        case other => b.append(other)
      }
      k += 1
    }
    b.toString
  }

  private val B = org.apache.spark.sql.graft.Bridge

  /** The normalization column ([[CleanText]]) — run it before exact
    * dedup / MinHash / fingerprint hashing. */
  def clean(text: Column): Column =
    B.column(CleanText(B.expression(text)))
}
