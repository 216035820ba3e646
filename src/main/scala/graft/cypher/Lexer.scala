package graft.cypher

/** Hand-rolled tokenizer for the Cypher surface (the reference uses a
  * flex scanner, src/backend/parser/ag_scanner.l; we only need the token
  * inventory, not the implementation).
  */
object Lexer {
  sealed trait Token { def pos: Int }
  final case class Ident(value: String, pos: Int) extends Token // unquoted or `quoted`
  final case class Kw(value: String, pos: Int) extends Token // uppercased keyword form of ident
  final case class IntLit(value: Long, pos: Int) extends Token
  final case class FloatLit(value: Double, pos: Int) extends Token
  /** Decimal integer literal past int64 — the reference's scanner reads
    * it as numeric (ag_scanner.l integer overflow path). */
  final case class NumericLit(value: BigDecimal, pos: Int) extends Token
  final case class StrLit(value: String, pos: Int) extends Token
  final case class Sym(value: String, pos: Int) extends Token
  final case class ParamTok(name: String, pos: Int) extends Token
  final case class EOF(pos: Int) extends Token

  private val symbols = List(
    "@>>", "<<@", "@>", "<@", "#>>", "#>", "?|", "?&", "?", "->>",
    // pgvector distance operators (reference: regress/sql/pgvector.sql)
    // — before "<>"/"<="/"<-" so the 3-char forms win the scan
    "<->", "<#>", "<=>", "<+>",
    "<>", "<=", ">=", "->", "<-", "..", "+=", "=~", "||",
    "(", ")", "[", "]", "{", "}", ",", ":", ";", ".", "=", "<", ">", "+",
    "-", "*", "/", "%", "^", "|", "$")

  final case class LexError(msg: String, pos: Int) extends RuntimeException(s"$msg at $pos")

  def tokenize(input: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input.charAt(i)
      if (c.isWhitespace) { i += 1 }
      else if (c == '/' && i + 1 < n && input.charAt(i + 1) == '/') {
        while (i < n && input.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && input.charAt(i + 1) == '*') {
        val end = input.indexOf("*/", i + 2)
        i = if (end < 0) n else end + 2
      } else if (c == '0' && i + 1 < n &&
          (input.charAt(i + 1) == 'x' || input.charAt(i + 1) == 'X')) {
        // hexadecimal integer literal (reference: ag_scanner.l hexint)
        val start = i
        i += 2
        val hs = i
        while (i < n && Character.digit(input.charAt(i), 16) >= 0) i += 1
        if (i == hs) throw LexError("invalid hexadecimal integer literal", start)
        val hexVal =
          try java.lang.Long.parseLong(input.substring(hs, i), 16)
          catch {
            case _: NumberFormatException =>
              throw LexError("hexadecimal integer literal out of range", start)
          }
        out += IntLit(hexVal, start)
      } else if (c.isDigit || (c == '.' && i + 1 < n && input.charAt(i + 1).isDigit)) {
        val start = i
        var isFloat = false
        while (i < n && input.charAt(i).isDigit) i += 1
        // '..' is a range, not a decimal point; a bare trailing '.' is a
        // float ("1." — reference decimal pattern digitseq\.)
        if (i < n && input.charAt(i) == '.' &&
            !(i + 1 < n && input.charAt(i + 1) == '.')) {
          isFloat = true; i += 1
          while (i < n && input.charAt(i).isDigit) i += 1
        }
        if (i < n && (input.charAt(i) == 'e' || input.charAt(i) == 'E')) {
          val save = i
          i += 1
          if (i < n && (input.charAt(i) == '+' || input.charAt(i) == '-')) i += 1
          if (i < n && input.charAt(i).isDigit) {
            isFloat = true
            while (i < n && input.charAt(i).isDigit) i += 1
          } else i = save
        }
        val text = input.substring(start, i)
        if (isFloat) out += FloatLit(text.toDouble, start)
        else if (text.length > 1 && text.charAt(0) == '0') {
          // leading zero = octal (reference: strtoint base 0,
          // ag_scanner.l:988; "08" is an invalid octal literal)
          if (text.exists(ch => ch > '7'))
            throw LexError("invalid octal integer literal", start)
          out += IntLit(java.lang.Long.parseLong(text, 8), start)
        } else out +=
          (try IntLit(text.toLong, start)
          catch {
            case _: NumberFormatException => NumericLit(BigDecimal(text), start)
          })
      } else if (c == '\'' || c == '"') {
        val start = i
        val quote = c
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = input.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            input.charAt(i + 1) match {
              case 'n' => sb += '\n'
              case 't' => sb += '\t'
              case 'r' => sb += '\r'
              case 'b' => sb += '\b'
              case 'f' => sb += '\f'
              case 'u' if i + 5 < n =>
                sb += Integer.parseInt(input.substring(i + 2, i + 6), 16).toChar
                i += 4
              case other => sb += other
            }
            i += 2
          } else if (ch == quote && i + 1 < n && input.charAt(i + 1) == quote) {
            // doubled quote = escaped quote (reference: ag_scanner.l
            // essquote/esdquote rules, :198-199/:425-430)
            sb += quote; i += 2
          } else if (ch == quote) { closed = true; i += 1 }
          else { sb += ch; i += 1 }
        }
        if (!closed) throw LexError("unterminated string", start)
        out += StrLit(sb.toString, start)
      } else if (c == '`') {
        // doubled backquote = escaped backquote (ag_scanner.l esbquote)
        val start = i
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = input.charAt(i)
          if (ch == '`' && i + 1 < n && input.charAt(i + 1) == '`') { sb += '`'; i += 2 }
          else if (ch == '`') { closed = true; i += 1 }
          else { sb += ch; i += 1 }
        }
        if (!closed) throw LexError("unterminated quoted identifier", start)
        out += Ident(sb.toString, start)
      } else if (c != '$' && Character.isJavaIdentifierStart(c)) {
        // '$' introduces a parameter (Sym + Ident), never an identifier
        val start = i
        while (i < n && input.charAt(i) != '$' &&
          Character.isJavaIdentifierPart(input.charAt(i))) i += 1
        out += Ident(input.substring(start, i), start)
      } else {
        symbols.find(s => input.startsWith(s, i)) match {
          case Some(s) => out += Sym(s, i); i += s.length
          case None => throw LexError(s"unexpected character '$c'", i)
        }
      }
    }
    out += EOF(n)
    out.result()
  }
}
