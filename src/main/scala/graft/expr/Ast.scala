package graft.expr

/** AST of the s-expression query language.
  *
  * Mirrors the reference's shlex + recursive-descent reader
  * (tanker/expression.py:222-284) but is context-free: symbol/column
  * resolution and env macro-expansion happen at compile time
  * ([[Compiler]]), not parse time.
  */
sealed trait Ast

object Ast {
  /** Quoted string literal. */
  final case class Str(value: String) extends Ast
  /** Numeric literal (Long or Double). */
  final case class Num(value: Any) extends Ast
  /** `{...}` parameter: key, dotted tail, `!conversion`, `:format_spec`
    * (tanker/expression.py:353-367). */
  final case class Param(key: String, tail: Seq[String],
      conversion: Option[String], fmtSpec: Option[String]) extends Ast
  /** Bare word: column, dotted path, builtin, field alias — resolved
    * at compile time. */
  final case class Word(token: String) extends Ast
  /** Parenthesized expression. */
  final case class Node(items: Seq[Ast]) extends Ast

  def param(body: String): Param = {
    // Order matters: ":" starts the format spec, "!" the conversion
    // (tanker/expression.py:359-364).
    var tok = body
    var fmtSpec: Option[String] = None
    var conv: Option[String] = None
    val ci = tok.indexOf(':')
    if (ci >= 0) { fmtSpec = Some(tok.substring(ci + 1)); tok = tok.substring(0, ci) }
    val bi = tok.indexOf('!')
    if (bi >= 0) { conv = Some(tok.substring(bi + 1)); tok = tok.substring(0, bi) }
    val parts = tok.split("\\.").toSeq
    if (parts.isEmpty) Param("", Nil, conv, fmtSpec)
    else Param(parts.head, parts.tail, conv, fmtSpec)
  }
}

object Parser {
  private sealed trait Tok
  private case object Open extends Tok
  private case object Close extends Tok
  private final case class Quoted(s: String) extends Tok
  private final case class WordTok(s: String) extends Tok

  /** shlex-equivalent: word chars are alnum + `_.!=<>:{}-`
    * (tanker/expression.py:223-224); anything else non-space is a
    * single-char token. */
  private def isWordChar(c: Char): Boolean =
    c.isLetterOrDigit || "_.!=<>:{}-".indexOf(c) >= 0

  private def tokenize(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += Open; i += 1 }
      else if (c == ')') { out += Close; i += 1 }
      else if (c == '"' || c == '\'') {
        val sb = new StringBuilder
        i += 1
        while (i < n && s.charAt(i) != c) {
          if (s.charAt(i) == '\\' && i + 1 < n && s.charAt(i + 1) == c) i += 1
          sb += s.charAt(i); i += 1
        }
        if (i >= n) throw new IllegalArgumentException(s"Unterminated string in: $s")
        i += 1
        out += Quoted(sb.toString)
      } else if (isWordChar(c)) {
        val start = i
        while (i < n && isWordChar(s.charAt(i))) i += 1
        out += WordTok(s.substring(start, i))
      } else { // single-char punctuation token: + * / % etc.
        out += WordTok(c.toString); i += 1
      }
    }
    out.toList
  }

  /** Parse one expression; trailing tokens are an error
    * (tanker/expression.py:246-247). */
  def parse(s: String): Ast = {
    var toks = tokenize(s)
    if (toks.isEmpty) throw new IllegalArgumentException("empty expression")
    val (ast, rest) = read(toks)
    if (rest.nonEmpty)
      throw new IllegalArgumentException(s"""Unexpected tokens after ending ")" in: $s""")
    ast
  }

  private def read(toks: List[Tok]): (Ast, List[Tok]) = toks match {
    case Nil => throw new IllegalArgumentException("unexpected EOF while reading")
    case Open :: rest =>
      val items = scala.collection.mutable.ListBuffer[Ast]()
      var cur = rest
      while (cur.headOption.exists(_ != Close)) {
        val (a, next) = read(cur)
        items += a
        cur = next
      }
      if (cur.isEmpty) throw new IllegalArgumentException("unexpected EOF while reading")
      (Ast.Node(items.toSeq), cur.tail)
    case Close :: _ => throw new IllegalArgumentException("unexpected )")
    case Quoted(s) :: rest => (Ast.Str(s), rest)
    case WordTok(w) :: rest => (atom(w), rest)
  }

  /** Classify a bare token (tanker/expression.py:258-284). Column-ness
    * is decided later at compile time; here only params and numbers are
    * split out. */
  private def atom(token: String): Ast = {
    if (token.length > 1 && token.head == '{' && token.last == '}')
      Ast.param(token.substring(1, token.length - 1))
    else {
      try Ast.Num(java.lang.Long.parseLong(token))
      catch {
        case _: NumberFormatException =>
          try Ast.Num(java.lang.Double.parseDouble(token))
          catch { case _: NumberFormatException => Ast.Word(token) }
      }
    }
  }
}
