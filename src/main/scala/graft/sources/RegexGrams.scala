package graft.sources

/** Required-literal analysis for regex corpus grep over the trigram
  * index — the published Code-Search design (R. Cox, "Regular
  * Expression Matching with a Trigram Index", 2012, public essay):
  * every string matched by a regex must CONTAIN certain literal
  * substrings, so a trigram index can produce a candidate superset
  * for a regex sweep exactly as it does for literal sweeps, with the
  * exact verifier (`regexp_like`) deciding.
  *
  * This implements a deliberately CONSERVATIVE fragment of that
  * algebra: a regex is parsed (recursive descent over the common
  * syntax: literals, escapes, classes, `.`, groups incl. `(?:`,
  * zero-width assertions, alternation, quantifiers) and lowered to
  * alternation-free BRANCHES (cross-product, capped); each branch
  * yields its maximal required literal RUNS — consecutive characters
  * every match of that branch must contain adjacently. Soundness
  * direction is one-way by construction: anything not understood
  * (classes, `.`, `\d`-style escapes, optional/starred units,
  * lookaround INTERIORS) degrades to an adjacency BREAK that
  * contributes nothing — the analysis may under-constrain (bigger
  * candidate set) but never over-constrains, so candidates remain a
  * superset of true matches and the verify keeps the result exact.
  * Patterns it cannot usefully constrain (no run of ≥ 3 code points
  * in some branch, exotic syntax, branch blow-up past the cap)
  * return None and the caller routes them through the exact scan.
  *
  * Zero-width elements (`^ $ \b \B`, lookarounds) preserve adjacency:
  * they consume no characters, so literals on both sides of one are
  * still adjacent in any match — dropping the assertion only widens
  * the candidate set. Quantifiers: min ≥ 1 keeps one required copy of
  * the unit followed by a break (`(abc)+` requires one "abc");
  * min = 0 is a pure break. */
object RegexGrams {

  private sealed trait Re
  private case class Lit(cp: Int) extends Re
  private case object Opaque extends Re // consumes unknown chars
  private case object Zero extends Re // zero-width: keeps adjacency
  private case class Cat(xs: List[Re]) extends Re
  private case class Alt(xs: List[Re]) extends Re

  /** Parse + analyze: Some(branches), each branch the list of its
    * required literal runs with ≥ `minRun` code points — or None when
    * the pattern yields no usable constraint for at least one branch
    * (route those through the exact scan; the analysis must constrain
    * EVERY alternative or it constrains nothing). */
  def requiredLiterals(regex: String, minRun: Int = 3,
                       maxBranches: Int = 64): Option[Seq[Seq[String]]] =
    try {
      val (re, rest) = parseAlt(regex, 0)
      if (rest != regex.length) return None // trailing ')' etc
      branches(re, maxBranches).flatMap { bs =>
        val runs = bs.map(runsOf(_, minRun))
        // every branch must carry at least one usable run, else the
        // OR admits unconstrained matches and the index can't help
        if (runs.exists(_.isEmpty)) None else Some(runs)
      }
    } catch { case _: UnsupportedSyntax => None }

  private final class UnsupportedSyntax extends RuntimeException

  // ---- recursive-descent parser over String indices (code-point
  // aware only where literals are collected; syntax chars are BMP)

  private def parseAlt(s: String, i0: Int): (Re, Int) = {
    var i = i0
    val alts = scala.collection.mutable.ListBuffer.empty[Re]
    val (first, i1) = parseCat(s, i)
    alts += first; i = i1
    while (i < s.length && s.charAt(i) == '|') {
      val (nxt, i2) = parseCat(s, i + 1)
      alts += nxt; i = i2
    }
    (if (alts.size == 1) alts.head else Alt(alts.toList), i)
  }

  private def parseCat(s: String, i0: Int): (Re, Int) = {
    var i = i0
    val xs = scala.collection.mutable.ListBuffer.empty[Re]
    while (i < s.length && s.charAt(i) != '|' && s.charAt(i) != ')') {
      val (unit, i1) = parseUnit(s, i)
      val (wrapped, i2) = parseQuant(s, i1, unit)
      xs += wrapped; i = i2
    }
    (Cat(xs.toList), i)
  }

  private def parseUnit(s: String, i: Int): (Re, Int) = s.charAt(i) match {
    case '(' => parseGroup(s, i)
    case '[' => (Opaque, skipClass(s, i))
    case '.' => (Opaque, i + 1)
    case '^' | '$' => (Zero, i + 1)
    case '\\' => parseEscape(s, i)
    case '*' | '+' | '?' | '{' => throw new UnsupportedSyntax // dangling
    case c if Character.isHighSurrogate(c) =>
      // only a WELL-FORMED pair is a supplementary literal; an
      // unpaired surrogate must reject loudly — the old two-char
      // consume silently DROPPED the following real character from
      // the run, the one spot where the analysis could
      // over-constrain and miss true matches (r17 advice/verdict)
      if (i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1)))
        (Lit(s.codePointAt(i)), i + 2)
      else throw new UnsupportedSyntax
    case c if Character.isLowSurrogate(c) => throw new UnsupportedSyntax
    case c => (Lit(c.toInt), i + 1)
  }

  private def parseEscape(s: String, i: Int): (Re, Int) = {
    if (i + 1 >= s.length) throw new UnsupportedSyntax
    s.charAt(i + 1) match {
      case 'd' | 'D' | 's' | 'S' | 'w' | 'W' | 'h' | 'H' | 'v' | 'V' =>
        (Opaque, i + 2)
      case 'b' | 'B' | 'A' | 'Z' | 'z' | 'G' => (Zero, i + 2)
      case 'n' => (Lit('\n'.toInt), i + 2)
      case 't' => (Lit('\t'.toInt), i + 2)
      case 'r' => (Lit('\r'.toInt), i + 2)
      case 'f' => (Lit('\f'.toInt), i + 2)
      case 'a' => (Lit(0x07), i + 2) // bell
      case 'e' => (Lit(0x1b), i + 2) // escape
      case 'Q' | 'E' | 'p' | 'P' | 'k' | 'x' | 'u' | '0' =>
        throw new UnsupportedSyntax // quoting blocks, properties, refs
      case c if c >= '1' && c <= '9' => throw new UnsupportedSyntax // backref
      // any OTHER letter/digit escape (\c, \R, \X, \N{...}, future
      // Java additions) compiles as a regex but is NOT an escaped
      // literal — treating it as one fabricated required runs true
      // matches don't contain (r17 advice: "page\fbreak" used to
      // require "pagefbreak"). Reject loudly → exact scan route;
      // only non-alphanumerics pass through as escaped punctuation.
      case c if Character.isLetterOrDigit(c) => throw new UnsupportedSyntax
      case c => (Lit(c.toInt), i + 2) // escaped punctuation
    }
  }

  private def parseGroup(s: String, i0: Int): (Re, Int) = {
    var i = i0 + 1
    var zeroWidth = false
    if (i < s.length && s.charAt(i) == '?') {
      if (i + 1 >= s.length) throw new UnsupportedSyntax
      s.charAt(i + 1) match {
        case ':' => i += 2
        case '=' | '!' => zeroWidth = true; i += 2
        case '<' =>
          if (i + 2 < s.length &&
              (s.charAt(i + 2) == '=' || s.charAt(i + 2) == '!')) {
            zeroWidth = true; i += 3
          } else { // named group (?<name>...)
            val close = s.indexOf('>', i)
            if (close < 0) throw new UnsupportedSyntax
            i = close + 1
          }
        case _ => throw new UnsupportedSyntax // flags, atomic, etc.
      }
    }
    val (inner, i1) = parseAlt(s, i)
    if (i1 >= s.length || s.charAt(i1) != ')') throw new UnsupportedSyntax
    // lookaround interiors constrain matches we choose not to model:
    // dropping them only widens candidates (superset-safe)
    (if (zeroWidth) Zero else inner, i1 + 1)
  }

  private def skipClass(s: String, i0: Int): Int = {
    var i = i0 + 1
    if (i < s.length && s.charAt(i) == '^') i += 1
    if (i < s.length && s.charAt(i) == ']') i += 1 // literal ] first
    while (i < s.length && s.charAt(i) != ']') {
      s.charAt(i) match {
        case '\\' => i += 2
        // Java classes NEST ([a[b]c], [a-z&&[aeiou]]): terminating at
        // the first ']' parsed the tail as required literals true
        // matches don't contain (r17 advice). Recurse per nesting.
        case '[' => i = skipClass(s, i)
        case _ => i += 1
      }
    }
    if (i >= s.length) throw new UnsupportedSyntax
    i + 1
  }

  private def parseQuant(s: String, i0: Int, unit: Re): (Re, Int) = {
    if (i0 >= s.length) return (unit, i0)
    val (min, i1) = s.charAt(i0) match {
      case '*' => (0, i0 + 1)
      case '+' => (1, i0 + 1)
      case '?' => (0, i0 + 1)
      case '{' =>
        val close = s.indexOf('}', i0)
        if (close < 0) throw new UnsupportedSyntax
        val body = s.substring(i0 + 1, close)
        val m = body.takeWhile(_.isDigit)
        if (m.isEmpty) throw new UnsupportedSyntax
        (if (m.toLong >= 1) 1 else 0, close + 1)
      case _ => return (unit, i0)
    }
    // swallow lazy/possessive marker
    val i2 = if (i1 < s.length &&
                 (s.charAt(i1) == '?' || s.charAt(i1) == '+')) i1 + 1 else i1
    // min>=1: one copy of the unit is required, repetition is opaque;
    // min=0: the whole unit is optional — pure adjacency break
    (if (min >= 1) Cat(List(unit, Opaque)) else Opaque, i2)
  }

  // ---- lowering to alternation-free branches

  private sealed trait Elem
  private case class C(cp: Int) extends Elem
  private case object Brk extends Elem

  private def branches(re: Re, cap: Int): Option[List[List[Elem]]] = re match {
    case Lit(cp) => Some(List(List(C(cp))))
    case Opaque => Some(List(List(Brk)))
    case Zero => Some(List(Nil)) // zero-width: adjacency preserved
    case Cat(xs) =>
      xs.foldLeft(Option(List(List.empty[Elem]))) { (accOpt, x) =>
        for {
          acc <- accOpt
          bx <- branches(x, cap)
          prod = for (a <- acc; b <- bx) yield a ++ b
          r <- if (prod.size > cap) None else Some(prod)
        } yield r
      }
    case Alt(xs) =>
      xs.foldLeft(Option(List.empty[List[Elem]])) { (accOpt, x) =>
        for {
          acc <- accOpt
          bx <- branches(x, cap)
          r <- if (acc.size + bx.size > cap) None else Some(acc ++ bx)
        } yield r
      }
  }

  private def runsOf(elems: List[Elem], minRun: Int): Seq[String] = {
    val runs = scala.collection.mutable.ListBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    def flush(): Unit = {
      val r = sb.toString
      if (r.codePointCount(0, r.length) >= minRun) runs += r
      sb.setLength(0)
    }
    elems.foreach {
      case C(cp) => sb.appendCodePoint(cp)
      case Brk => flush()
    }
    flush()
    runs.toSeq
  }
}
