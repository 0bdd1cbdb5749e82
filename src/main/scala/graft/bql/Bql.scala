package graft.bql

import graft.model._

/**
 * BQL-style string front-end: a SQL-ish query language compiled to
 * [[QuerySpec]] (the reference exposes BQL in bullet-core's query layer —
 * SURVEY §2.10 [core-only]; this is a re-expressed subset, not a port).
 *
 * Grammar (keywords case-insensitive):
 * {{{
 * SELECT <items> FROM STREAM
 *   [WHERE <expr>] [GROUP BY <fields>] [HAVING <expr>]
 *   [ORDER BY f [ASC|DESC], ...] [LIMIT n]
 *   [WINDOWING EVERY n (TIME|RECORD)
 *     [ALL | INCLUDE ALL | INCLUDE FIRST m (TIME|RECORD)]] [DURATION ms]
 *
 * items: * | expr [AS name] | COUNT(*) | COUNT(DISTINCT f, ...)
 *      | SUM/MIN/MAX/AVG/COUNT(f) | TOP(k, f, ...) | QUANTILE(f, [p, ...])
 *      | FREQ(f, [s, ...]) | CUMFREQ(f, [s, ...])
 * expr:  OR < AND < NOT < cmp (= != <> > < >= <= IN RLIKE BETWEEN..AND
 *        CONTAINSKEY CONTAINSVALUE) < + - < * / % < unary
 *        (SIZEOF/ABS/LOWER/UPPER/TRIM/CAST(e AS T)) < primary
 *        (literal, 'string', [list], field, map.subfield, parens)
 * }}}
 */
object Bql {

  def parse(input: String, id: String = "bql"): QuerySpec =
    new Parser(Lexer.tokenize(input)).parseQuery(id)

  // ------------------------------------------------------------------ lexer

  sealed trait Tok
  final case class Ident(s: String) extends Tok
  final case class NumLit(v: Any) extends Tok // Long or Double
  final case class StrLit(s: String) extends Tok
  final case class Sym(s: String) extends Tok

  object Lexer {
    private val symbols = Seq(">=", "<=", "!=", "<>", "=", ">", "<", "(", ")",
      "[", "]", ",", "+", "-", "*", "/", "%", ".")

    def tokenize(in: String): Vector[Tok] = {
      val out = Vector.newBuilder[Tok]
      var i = 0
      while (i < in.length) {
        val c = in(i)
        if (c.isWhitespace) i += 1
        else if (c == '\'') {
          val end = in.indexOf('\'', i + 1)
          require(end > 0, s"unterminated string literal at $i")
          out += StrLit(in.substring(i + 1, end)); i = end + 1
        }
        else if (c.isDigit || (c == '.' && i + 1 < in.length && in(i + 1).isDigit &&
                 !prevIsIdentOrClose(in, i))) {
          val start = i
          while (i < in.length && (in(i).isDigit || in(i) == '.')) i += 1
          val s = in.substring(start, i)
          out += NumLit(if (s.contains('.')) s.toDouble else s.toLong)
        }
        else symbols.find(sym => in.startsWith(sym, i)) match {
          case Some(sym) => out += Sym(sym); i += sym.length
          case None =>
            require(c.isLetter || c == '_', s"unexpected character '$c' at $i")
            val start = i
            while (i < in.length && (in(i).isLetterOrDigit || in(i) == '_')) i += 1
            out += Ident(in.substring(start, i))
        }
      }
      out.result()
    }
    private def prevIsIdentOrClose(in: String, i: Int): Boolean = {
      var j = i - 1
      while (j >= 0 && in(j).isWhitespace) j -= 1
      j >= 0 && (in(j).isLetterOrDigit || in(j) == ')' || in(j) == '_')
    }
  }

  // ----------------------------------------------------------------- parser

  private final class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Option[Tok] = toks.lift(pos)
    private def next(): Tok = {
      require(pos < toks.length, "unexpected end of query")
      val t = toks(pos); pos += 1; t
    }
    private def isKw(t: Tok, kw: String): Boolean = t match {
      case Ident(s) => s.equalsIgnoreCase(kw); case _ => false
    }
    private def atKw(kw: String): Boolean = peek.exists(isKw(_, kw))
    private def eatKw(kw: String): Unit = {
      require(peek.exists(isKw(_, kw)), s"expected $kw at token $pos (${peek})")
      pos += 1
    }
    private def tryKw(kw: String): Boolean = if (atKw(kw)) { pos += 1; true } else false
    private def eatSym(s: String): Unit = {
      require(peek.contains(Sym(s)), s"expected '$s' at token $pos (${peek})"); pos += 1
    }
    private def trySym(s: String): Boolean =
      if (peek.contains(Sym(s))) { pos += 1; true } else false
    private def ident(): String = next() match {
      case Ident(s) => s
      case t => throw new IllegalArgumentException(s"expected identifier, got $t")
    }

    // ---- select items --------------------------------------------------
    sealed trait Item
    case object Star extends Item
    final case class ExprItem(e: Expr, as: Option[String]) extends Item
    final case class AggItem(op: GroupOpType.Value, field: Option[String], as: Option[String]) extends Item
    final case class CountDistinctItem(fields: Seq[String], as: Option[String]) extends Item
    final case class TopItem(k: Int, fields: Seq[String], as: Option[String]) extends Item
    final case class DistItem(dtype: DistributionType.Value, field: String,
                              points: Seq[Double], numPoints: Option[Int],
                              as: Option[String]) extends Item

    def parseQuery(id: String): QuerySpec = {
      eatKw("SELECT")
      val items = parseItems()
      eatKw("FROM"); eatKw("STREAM")
      val filter = if (tryKw("WHERE")) Some(parseExpr()) else None
      val groupBy = if (tryKw("GROUP")) { eatKw("BY"); Some(parseFieldList()) } else None
      val having = if (tryKw("HAVING")) Some(parseExpr()) else None
      val orderBy = if (tryKw("ORDER")) { eatKw("BY"); Some(parseOrderList()) } else None
      val limit = if (tryKw("LIMIT")) Some(parseLong().toInt) else None
      val window = if (tryKw("WINDOWING")) Some(parseWindow()) else None
      val duration = if (tryKw("DURATION")) parseLong() else 10000L
      require(pos == toks.length, s"unexpected trailing tokens at $pos: ${toks.drop(pos)}")
      assemble(id, items, filter, groupBy, having, orderBy, limit, window, duration)
    }

    private def parseItems(): Seq[Item] = {
      val items = Seq.newBuilder[Item]
      do items += parseItem() while (trySym(","))
      items.result()
    }

    private def parseItem(): Item = {
      if (peek.contains(Sym("*"))) { pos += 1; return Star }
      peek match {
        case Some(Ident(fn)) if isAggName(fn) && toks.lift(pos + 1).contains(Sym("(")) =>
          parseAggItem(fn)
        case Some(Ident(fn)) if fn.equalsIgnoreCase("EXPLODE") &&
            toks.lift(pos + 1).contains(Sym("(")) =>
          // LATERAL VIEW-style table function: top-level select item only
          pos += 1; eatSym("(")
          val e = parseExpr(); eatSym(")")
          ExprItem(Explode(e), parseAs())
        case _ =>
          val e = parseExpr()
          ExprItem(e, parseAs())
      }
    }

    private def isAggName(s: String): Boolean =
      Seq("COUNT", "SUM", "MIN", "MAX", "AVG", "TOP", "QUANTILE", "FREQ", "CUMFREQ")
        .exists(s.equalsIgnoreCase)

    private def parseAggItem(fn: String): Item = {
      pos += 1 // fn
      eatSym("(")
      val item = fn.toUpperCase match {
        case "COUNT" =>
          if (trySym("*")) AggItem(GroupOpType.COUNT, None, None)
          else if (tryKw("DISTINCT")) CountDistinctItem(parseIdentList(), None)
          else AggItem(GroupOpType.COUNT_FIELD, Some(ident()), None)
        case "SUM" => AggItem(GroupOpType.SUM, Some(ident()), None)
        case "MIN" => AggItem(GroupOpType.MIN, Some(ident()), None)
        case "MAX" => AggItem(GroupOpType.MAX, Some(ident()), None)
        case "AVG" => AggItem(GroupOpType.AVG, Some(ident()), None)
        case "TOP" =>
          val k = parseLong().toInt; eatSym(",")
          TopItem(k, parseIdentList(), None)
        case "QUANTILE" | "FREQ" | "CUMFREQ" =>
          val f = ident(); eatSym(",")
          // [p, ...] = MANUAL; one count = LINEAR; start, end, inc = REGION
          val (pts, np) =
            if (peek.contains(Sym("["))) (parseDoubleArray(), None)
            else {
              val firstTok = next() match {
                case NumLit(v) => v
                case t => throw new IllegalArgumentException(s"expected number, got $t")
              }
              if (trySym(",")) {
                val start = firstTok match { case l: Long => l.toDouble; case d: Double => d }
                val end = parseNum(); eatSym(",")
                val inc = parseNum()
                (graft.streaming.QueryJson.regionToPoints(start, end, inc), None)
              } else firstTok match {
                // a LINEAR count is an integer by definition: reject 2.5
                // instead of silently truncating, and cap before Int wraps
                case l: Long if l >= 1 && l <= 10000 => (Seq.empty[Double], Some(l.toInt))
                case other => throw new IllegalArgumentException(
                  s"LINEAR point count must be an integer in [1, 10000], got $other")
              }
            }
          val dt = fn.toUpperCase match {
            case "QUANTILE" => DistributionType.QUANTILE
            case "FREQ"     => DistributionType.PMF
            case _          => DistributionType.CDF
          }
          DistItem(dt, f, pts, np, None)
      }
      eatSym(")")
      val as = parseAs()
      item match {
        case a: AggItem           => a.copy(as = as)
        case c: CountDistinctItem => c.copy(as = as)
        case t: TopItem           => t.copy(as = as)
        case d: DistItem          => d.copy(as = as)
        case other                => other
      }
    }

    private def parseAs(): Option[String] =
      if (tryKw("AS")) Some(ident()) else None

    private def parseIdentList(): Seq[String] = {
      val out = Seq.newBuilder[String]
      do out += ident() while (trySym(","))
      out.result()
    }

    private def parseFieldList(): Seq[String] = parseIdentList()

    private def parseOrderList(): Seq[(String, Boolean)] = {
      val out = Seq.newBuilder[(String, Boolean)]
      do {
        val f = ident()
        val asc = if (tryKw("DESC")) false else { tryKw("ASC"); true }
        out += (f -> asc)
      } while (trySym(","))
      out.result()
    }

    private def parseWindow(): WindowSpec = {
      eatKw("EVERY")
      val every = parseLong()
      val unit =
        if (tryKw("TIME")) WindowUnit.TIME
        else { eatKw("RECORD"); WindowUnit.RECORD }
      if (tryKw("ALL")) WindowSpec(unit, every, WindowUnit.ALL, every)
      else if (tryKw("INCLUDE")) {
        // INCLUDE ALL (additive) or INCLUDE FIRST m (TIME|RECORD)
        if (tryKw("ALL")) WindowSpec(unit, every, WindowUnit.ALL, every)
        else {
          eatKw("FIRST")
          val first = parseLong()
          val iu =
            if (tryKw("TIME")) WindowUnit.TIME
            else { eatKw("RECORD"); WindowUnit.RECORD }
          WindowSpec(unit, every, iu, first)
        }
      } else WindowSpec(unit, every, unit, every)
    }

    private def parseLong(): Long = next() match {
      case NumLit(l: Long) => l
      case t => throw new IllegalArgumentException(s"expected integer, got $t")
    }

    private def parseNum(): Double = next() match {
      case NumLit(l: Long)   => l.toDouble
      case NumLit(d: Double) => d
      case t => throw new IllegalArgumentException(s"expected number, got $t")
    }

    private def parseDoubleArray(): Seq[Double] = {
      eatSym("[")
      val out = Seq.newBuilder[Double]
      do out += (next() match {
        case NumLit(d: Double) => d
        case NumLit(l: Long)   => l.toDouble
        case t => throw new IllegalArgumentException(s"expected number, got $t")
      }) while (trySym(","))
      eatSym("]")
      out.result()
    }

    // ---- expressions (precedence climbing) -----------------------------
    def parseExpr(): Expr = parseOr()

    private def parseOr(): Expr = {
      var l = parseAnd()
      while (tryKw("OR")) l = NAry(NAryOp.OR, Seq(l, parseAnd()))
      l
    }
    private def parseAnd(): Expr = {
      var l = parseNot()
      while (tryKw("AND")) l = NAry(NAryOp.AND, Seq(l, parseNot()))
      l
    }
    private def parseNot(): Expr =
      if (tryKw("NOT")) Unary(UnaryOp.NOT, parseNot()) else parseCmp()

    private def parseCmp(): Expr = {
      val l = parseAdd()
      peek match {
        case Some(Sym("="))  => pos += 1; Binary(l, parseAdd(), BinOp.EQUALS)
        case Some(Sym("!=")) | Some(Sym("<>")) => pos += 1; Binary(l, parseAdd(), BinOp.NOT_EQUALS)
        case Some(Sym(">=")) => pos += 1; Binary(l, parseAdd(), BinOp.GREATER_OR_EQUALS)
        case Some(Sym("<=")) => pos += 1; Binary(l, parseAdd(), BinOp.LESS_OR_EQUALS)
        case Some(Sym(">"))  => pos += 1; Binary(l, parseAdd(), BinOp.GREATER_THAN)
        case Some(Sym("<"))  => pos += 1; Binary(l, parseAdd(), BinOp.LESS_THAN)
        case Some(t) if isKw(t, "IN") => pos += 1; Binary(l, parsePrimary(), BinOp.IN)
        case Some(t) if isKw(t, "RLIKE") => pos += 1; Binary(l, parsePrimary(), BinOp.REGEX_LIKE)
        case Some(t) if isKw(t, "CONTAINSKEY") => pos += 1; Binary(l, parsePrimary(), BinOp.CONTAINS_KEY)
        case Some(t) if isKw(t, "CONTAINSVALUE") => pos += 1; Binary(l, parsePrimary(), BinOp.CONTAINS_VALUE)
        case Some(t) if isKw(t, "BETWEEN") =>
          pos += 1
          val lo = parseAdd(); eatKw("AND"); val hi = parseAdd()
          NAry(NAryOp.BETWEEN, Seq(l, lo, hi))
        case _ => l
      }
    }

    private def parseAdd(): Expr = {
      var l = parseMul()
      var go = true
      while (go) peek match {
        case Some(Sym("+")) => pos += 1; l = Binary(l, parseMul(), BinOp.ADD)
        case Some(Sym("-")) => pos += 1; l = Binary(l, parseMul(), BinOp.SUB)
        case _ => go = false
      }
      l
    }
    private def parseMul(): Expr = {
      var l = parseUnary()
      var go = true
      while (go) peek match {
        case Some(Sym("*")) => pos += 1; l = Binary(l, parseUnary(), BinOp.MUL)
        case Some(Sym("/")) => pos += 1; l = Binary(l, parseUnary(), BinOp.DIV)
        case Some(Sym("%")) => pos += 1; l = Binary(l, parseUnary(), BinOp.MOD)
        case _ => go = false
      }
      l
    }

    private val unaryFns: Map[String, UnaryOp.Value] = Map(
      "SIZEOF" -> UnaryOp.SIZE_OF, "ABS" -> UnaryOp.ABS, "TRIM" -> UnaryOp.TRIM,
      "LOWER" -> UnaryOp.LOWER, "UPPER" -> UnaryOp.UPPER)

    private def parseUnary(): Expr = peek match {
      case Some(Sym("-")) => // unary minus: negative literals fold directly
        pos += 1
        parseUnary() match {
          case Lit(l: Long)   => Lit(-l)
          case Lit(d: Double) => Lit(-d)
          case e              => Binary(Lit(0L), e, BinOp.SUB)
        }
      case Some(Ident(fn)) if unaryFns.contains(fn.toUpperCase) &&
          toks.lift(pos + 1).contains(Sym("(")) =>
        pos += 1; eatSym("(")
        val e = parseExpr(); eatSym(")")
        Unary(unaryFns(fn.toUpperCase), e)
      case Some(Ident(fn)) if fn.equalsIgnoreCase("CAST") =>
        pos += 1; eatSym("(")
        val e = parseExpr(); eatKw("AS")
        val t = FieldType.withName(ident().toUpperCase)
        eatSym(")")
        Cast(e, t)
      case _ => parsePrimary()
    }

    private def parsePrimary(): Expr = next() match {
      case NumLit(v)  => Lit(v)
      case StrLit(s)  => Lit(s)
      case Sym("(")   => val e = parseExpr(); eatSym(")"); e
      case Sym("[")   =>
        val items = Seq.newBuilder[Expr]
        do items += parsePrimary() while (trySym(","))
        eatSym("]")
        ListExpr(items.result())
      case Ident(s) if s.equalsIgnoreCase("TRUE")  => Lit(true)
      case Ident(s) if s.equalsIgnoreCase("FALSE") => Lit(false)
      case Ident(s) if s.equalsIgnoreCase("NULL")  => Lit(null)
      case Ident(f) =>
        // field, map/struct subfield, and deeper paths: f.k1.k2, f[0].k —
        // the nested list-of-map / map-of-map lattice (0-based indices)
        var e: Expr =
          if (trySym(".")) Field(f, Some(ident())) else Field(f, None)
        var go = true
        while (go) {
          if (trySym(".")) e = ElementAt(e, ident())
          else if (peek.contains(Sym("[")) &&
              toks.lift(pos + 1).exists(_.isInstanceOf[NumLit])) {
            pos += 1
            val idx = parseLong().toInt
            eatSym("]")
            e = ElementAt(e, idx)
          } else go = false
        }
        e
      case t => throw new IllegalArgumentException(s"unexpected token $t")
    }

    // ---- assembly ------------------------------------------------------
    private def assemble(id: String, items: Seq[Item], filter: Option[Expr],
                         groupBy: Option[Seq[String]], having: Option[Expr],
                         orderBy: Option[Seq[(String, Boolean)]], limit: Option[Int],
                         window: Option[WindowSpec], duration: Long): QuerySpec = {
      val aggItems = items.collect { case a: AggItem => a }
      val cdItems = items.collect { case c: CountDistinctItem => c }
      val topItems = items.collect { case t: TopItem => t }
      val distItems = items.collect { case d: DistItem => d }
      val exprItems = items.collect { case e: ExprItem => e }

      def opName(a: AggItem, i: Int): String =
        a.as.getOrElse(a.field.map(f => s"${a.op.toString.toLowerCase}_$f")
          .getOrElse(s"agg_$i"))

      val aggregation: Aggregation =
        if (cdItems.nonEmpty) {
          require(cdItems.size == 1 && items.size == 1, "COUNT(DISTINCT) must be the only select item")
          CountDistinct(cdItems.head.fields, cdItems.head.as.getOrElse("count"))
        } else if (topItems.nonEmpty) {
          require(topItems.size == 1 && items.size == 1, "TOP must be the only select item")
          val t = topItems.head
          TopK(t.fields.map(f => f -> f), t.k, t.as.getOrElse("count"))
        } else if (distItems.nonEmpty) {
          require(distItems.size == 1 && items.size == 1, "distribution must be the only select item")
          val d = distItems.head
          Distribution(d.field, d.dtype, d.points, numPoints = d.numPoints)
        } else if (groupBy.isDefined) {
          val keys = groupBy.get
          // non-agg select items must be the group keys (with optional rename)
          val renames = keys.map { k =>
            k -> exprItems.collectFirst {
              case ExprItem(Field(`k`, None), Some(as)) => as
            }.getOrElse(k)
          }
          // LIMIT maps to the aggregation size (the reference's BQL LIMIT
          // sets aggregation.size): it caps the retained group entries.
          GroupBy(renames, aggItems.zipWithIndex.map { case (a, i) =>
            GroupOp(a.op, a.field, opName(a, i)) },
            entries = limit.getOrElse(512))
        } else if (aggItems.nonEmpty) {
          require(exprItems.isEmpty, "mixing aggregates and plain columns requires GROUP BY")
          GroupAll(aggItems.zipWithIndex.map { case (a, i) =>
            GroupOp(a.op, a.field, opName(a, i)) })
        } else {
          Raw(limit.getOrElse(500))
        }

      val projection = aggregation match {
        case _: Raw if !items.contains(Star) && exprItems.nonEmpty =>
          Some(exprItems.zipWithIndex.map { case (e, i) =>
            val name = e.as.getOrElse(e.e match {
              case Field(f, None) => f
              case Field(f, Some(sub)) => s"${f}_$sub"
              case _ => s"col_$i"
            })
            name -> e.e
          })
        case _ => None
      }

      val posts = Seq.newBuilder[PostAggregation]
      having.foreach(h => posts += Having(h))
      orderBy.foreach(o => posts += OrderBy(o))
      aggregation match {
        case _: Raw     => // LIMIT consumed as RAW size
        case _: GroupBy => // LIMIT consumed as the entries cap
        case _ => require(limit.isEmpty,
          "LIMIT is not supported for this aggregation type (use TOP/QUANTILE size arguments)")
      }

      QuerySpec(id, filter, projection, aggregation, window, duration, posts.result())
    }
  }
}
