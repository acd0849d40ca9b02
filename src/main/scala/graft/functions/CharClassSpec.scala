package graft.functions

/** A COMPILED single-character regex class — the data structure behind
  * the native `char_class_ratio` expression ([[TextFunctions.charRatio]]).
  * Matching is one branch + array probe per code point, replacing a
  * per-row `regexp_replace` + replaced-string build on the quality-signal
  * hot path.
  *
  * Semantics contract: for every class the parser ACCEPTS, `matchesCp`
  * must agree with Java regex (`Pattern.matches(cls, codepoint)`) on
  * every code point — Java character classes are code-point-aware, and
  * the un-flagged escapes are ASCII-only (`\s` = space TAB LF VT FF CR,
  * `\d` = 0-9, `\w` = A-Za-z0-9_ — NOT their Unicode extensions, which
  * need UNICODE_CHARACTER_CLASS). The equivalence spec pins this
  * exhaustively over the BMP + astral samples. Anything the parser is
  * not SURE about returns None and the caller keeps the regex spelling —
  * never a silently different match.
  */
final class CharClassSpec(negate: Boolean, ascii: Array[Boolean],
                          extraRanges: Array[Int]) extends Serializable {
  def matchesCp(cp: Int): Boolean = {
    val in =
      if (cp < 128) ascii(cp)
      else {
        var found = false
        var i = 0
        while (!found && i < extraRanges.length) {
          found = extraRanges(i) <= cp && cp <= extraRanges(i + 1)
          i += 2
        }
        found
      }
    in != negate
  }
}

object CharClassSpec {
  /** Parse the supported subset: `[...]` with an optional leading `^`;
    * members are literal code points, ranges `a-b`, the ASCII class
    * escapes `\s` `\d` `\w`, the control escapes `\n` `\t` `\r` `\f`,
    * and `\<punct>` escaped literals. A literal `-` is accepted first or
    * last (Java's rule). None for anything else — nested classes,
    * intersections (`&&`), other escapes, `-` in an ambiguous position —
    * the caller then uses the real regex engine.
    */
  def parse(cls: String): Option[CharClassSpec] = {
    if (cls.length < 3 || cls.head != '[' || cls.last != ']') return None
    var body = cls.substring(1, cls.length - 1)
    val negate = body.startsWith("^")
    if (negate) body = body.substring(1)
    if (body.isEmpty) return None
    val cps = body.codePoints().toArray
    val ascii = new Array[Boolean](128)
    val extra = scala.collection.mutable.ArrayBuffer.empty[Int]
    def add(cp: Int): Unit =
      if (cp < 128) ascii(cp) = true else { extra += cp; extra += cp }
    def addRange(a: Int, b: Int): Boolean = {
      if (a > b) return false // invalid in Java regex too — bail
      var c = a
      while (c <= b && c < 128) { ascii(c) = true; c += 1 }
      if (b >= 128) { extra += math.max(a, 128); extra += b }
      true
    }
    var i = 0
    var ok = true
    while (ok && i < cps.length) {
      val c = cps(i)
      if (c == '\\') {
        if (i + 1 >= cps.length) ok = false
        else {
          val e = cps(i + 1)
          // an escape may not START a range (rare; not worth modeling)
          val rangeNext = i + 2 < cps.length && cps(i + 2) == '-'
          e match {
            case _ if rangeNext => ok = false
            case 's' => Seq(' ', '\t', '\n', 0x0B, '\f', '\r').foreach(x => add(x.toInt))
            case 'd' => addRange('0', '9')
            case 'w' => addRange('a', 'z'); addRange('A', 'Z'); addRange('0', '9'); add('_')
            case 'n' => add('\n')
            case 't' => add('\t')
            case 'r' => add('\r')
            case 'f' => add('\f')
            case _ if !Character.isLetterOrDigit(e) => add(e) // \. \[ \- \\ …
            case _ => ok = false // \S \D \W \p{...} \x.. \u.. — unsupported
          }
          i += 2
        }
      } else if (c == '[' || (c == '&' && i + 1 < cps.length && cps(i + 1) == '&')) {
        ok = false // nested class / intersection
      } else if (c == '-') {
        // literal only first or last (Java's rule); elsewhere it is
        // either range syntax (consumed below) or ambiguous — bail
        if (i == 0 || i == cps.length - 1) { add('-'); i += 1 }
        else ok = false
      } else if (i + 2 < cps.length && cps(i + 1) == '-' && cps(i + 2) != '\\') {
        ok = addRange(c, cps(i + 2)); i += 3
      } else if (i + 2 == cps.length && cps(i + 1) == '-') {
        add(c); add('-'); i += 2 // trailing literal '-' after a member
      } else {
        add(c); i += 1
      }
    }
    if (!ok) None
    else Some(new CharClassSpec(negate, ascii, extra.toArray))
  }
}
