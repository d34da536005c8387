package graft.operators

/** BYTE-LEVEL pretokenization — the GPT-2/Llama-class front end that
  * makes a BPE tokenizer total: text is pretokenized by a regex, each
  * pretoken is re-expressed as its UTF-8 BYTES, and every byte is
  * mapped to a printable stand-in character (Radford et al. 2019,
  * `bytes_to_unicode`). The merge alphabet is then EXACTLY 256
  * symbols, every one of which is in the model's floor — so no input
  * string, in any script, ever maps to an unknown token (byte
  * fallback is structural, not a special case).
  *
  * Two deliberate, documented simplifications against GPT-2's literal
  * pattern, both in service of ENGINE-PORTABLE replay (the DuckDB
  * oracle runs RE2, which has no lookahead):
  *
  *  - no English contraction alternates (`'s|'t|...`) — an
  *    apostrophe-suffix lands in the punctuation branch instead;
  *  - no `\s+(?!\S)` trailing-whitespace lookahead — a run of
  *    whitespace between words becomes one whitespace pretoken
  *    instead of donating its last space to the next word. A single
  *    space still attaches to the following letter/digit/punctuation
  *    run via the ` ?` prefixes, which is the property the learned
  *    "Ġword" vocabulary shape depends on.
  *
  * The whitespace class is spelled EXPLICITLY (`[ \t\n\r\x0B\f]`)
  * rather than `\s` because Java's `\s` includes `\x0B` while RE2's
  * does not — the one corpus character that would silently diverge
  * between the engine and its oracle.
  *
  * Case is NOT normalized here (byte-level tokenizers are
  * case-preserving); callers wanting folded text pass `lower(text)`.
  *
  * Reference scope: the reference repo has no tokenizer; published
  * technique only (Radford et al. 2019 §2.2; Sennrich et al. 2016).
  */
object ByteLevel {

  /** The shared pretokenizer regex — compiled by Java on the engine
    * side and by RE2 in the oracle, byte-for-byte the same source.
    * Branch order is load-bearing (leftmost-first alternation in both
    * engines): letters, digits, punctuation (each with one optional
    * leading space), then whitespace runs. */
  val PreTokPattern: String =
    " ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\r\\x0B\\f\\p{L}\\p{N}]+|[ \\t\\n\\r\\x0B\\f]+"

  private val compiled = java.util.regex.Pattern.compile(PreTokPattern)

  /** `byteToChar(b)` = the printable stand-in for byte `b` (GPT-2's
    * `bytes_to_unicode`): the three printable Latin-1 runs map to
    * themselves; the 68 remaining bytes map to U+0100 + running rank
    * (so space 0x20 → 'Ġ' U+0120, newline 0x0A → 'Ċ' U+010A). Every
    * stand-in is a single BMP char and none is a literal space — a
    * mapped word can always be delimited by ' '. */
  val byteToChar: Array[Char] = {
    val out = new Array[Char](256)
    var next = 256
    var b = 0
    while (b < 256) {
      val printable = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174 && b <= 255)
      if (printable) out(b) = b.toChar
      else { out(b) = next.toChar; next += 1 }
      b += 1
    }
    out
  }

  /** Inverse of [[byteToChar]]: stand-in char → original byte. */
  val charToByte: Map[Char, Byte] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** One pretoken re-expressed over the 256-symbol byte alphabet: its
    * UTF-8 bytes, each mapped through [[byteToChar]] — one char per
    * byte (multibyte characters become several symbols; this is the
    * byte fallback). */
  def mapWord(word: String): String = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteToChar(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** Invert [[mapWord]] over a token (or concatenation of tokens):
    * stand-in chars → bytes → UTF-8 string. Total for any string the
    * encoder can emit; throws on a char outside the 256-symbol
    * alphabet (caller bug — such a symbol cannot come from
    * [[mapWord]]). */
  def unmapWord(symbols: String): String = {
    val bytes = new Array[Byte](symbols.length)
    var i = 0
    while (i < symbols.length) {
      bytes(i) = charToByte.getOrElse(symbols.charAt(i),
        throw new IllegalArgumentException(
          s"ByteLevel.unmapWord: '${symbols.charAt(i)}' (U+${symbols.charAt(i).toInt.toHexString}) is not a byte stand-in"))
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Pretokenize + byte-map one document: the local mirror of the
    * `byte_pretok` expression ([[graft.expressions.BytePreTok]]). */
  def preTokens(text: String): Seq[String] = {
    val m = compiled.matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) out += mapWord(m.group())
    out.result()
  }

  /** The [[byteToChar]] mapping as a DuckDB SQL scalar over an integer
    * byte expression `b` — the oracle's independent spelling of the
    * same published table (arithmetic on the rank structure, not a
    * 256-branch CASE): else-bytes 0..32 have rank b, 127..160 rank
    * 33+(b−127), 173 rank 67. */
  def byteMapSql(b: String): String =
    s"""chr(CASE WHEN ($b BETWEEN 33 AND 126) OR ($b BETWEEN 161 AND 172)
       |       OR ($b BETWEEN 174 AND 255) THEN $b
       |     WHEN $b <= 32 THEN 256 + $b
       |     WHEN $b = 173 THEN 323
       |     ELSE 162 + $b END)""".stripMargin.replace("\n", " ").replaceAll(" +", " ")

  /** DuckDB SQL: a pretoken string expression `w` → its byte-mapped
    * symbol string (the oracle's [[mapWord]]): per character, UTF-8
    * bytes derived from the codepoint by the encoding arithmetic, each
    * through [[byteMapSql]]. */
  def mapWordSql(w: String): String = {
    val cp = s"unicode(ch)"
    def mb(e: String) = byteMapSql(e)
    s"""array_to_string(flatten(list_transform(
       |  list_transform(range(1, len($w) + 1), i -> substr($w, i, 1)),
       |  ch -> CASE
       |    WHEN $cp < 128 THEN [${mb(cp)}]
       |    WHEN $cp < 2048 THEN [${mb(s"192 + $cp // 64")}, ${mb(s"128 + $cp % 64")}]
       |    WHEN $cp < 65536 THEN [${mb(s"224 + $cp // 4096")},
       |      ${mb(s"128 + ($cp // 64) % 64")}, ${mb(s"128 + $cp % 64")}]
       |    ELSE [${mb(s"240 + $cp // 262144")}, ${mb(s"128 + ($cp // 4096) % 64")},
       |      ${mb(s"128 + ($cp // 64) % 64")}, ${mb(s"128 + $cp % 64")}] END)), '')""".stripMargin
  }
}
