package graft.lang

import scala.util.parsing.combinator.RegexParsers
import Ast._

/** uDLang surface-syntax parser (clean-room from the grammar the reference
  * documents: grammar.lalrpop, README.md, manual.md, examples dir). Covers
  * script/version/input/output decls, let/func/proc/type, lambdas (incl.
  * function types with named params), control flow (if/elif/else expr+stmt,
  * for, suppose with `...;` splice), out/throw/`!` debug, match, and the
  * expression grammar with the reference's precedence
  * (grammar.lalrpop:398-507).
  */
object UdParser extends RegexParsers {
  // whitespace, line comments, block comments, shebang line
  override protected val whiteSpace =
    """(\s|//.*|#!.*|(?s)/\*.*?\*/)+""".r

  // ---- lexical ----
  private val ident = """[A-Za-z_][A-Za-z0-9_]*""".r
  private val intLit = """-?\d+(?![\d.eE])""".r
  private val floatLit = """-?\d+\.\d+([eE][+-]?\d+)?""".r
  private val strLit = """"([^"\\]|\\.)*"""".r

  /** Single left-to-right scan: each escape is consumed exactly once, so
    * "a\\nb" (backslash then n) stays backslash-n instead of newline. */
  private def unescape(s: String): String = {
    val body = s.substring(1, s.length - 1)
    val sb = new StringBuilder(body.length)
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\' && i + 1 < body.length) {
        body.charAt(i + 1) match {
          case 'n'   => sb.append('\n')
          case 't'   => sb.append('\t')
          case '"'   => sb.append('"')
          case '\\'  => sb.append('\\')
          case other => sb.append('\\').append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** keyword parser with word boundary (so `out` != prefix of `outer`) */
  private def kw(w: String): Parser[String] = (w + "\\b").r ^^ (_ => w)

  /** `$.y`-style expressions become unary lambdas (README.md:261). */
  private def desugarPlaceholder(e: Expr): Expr = {
    def contains(x: Expr): Boolean = x match {
      case Placeholder => true
      case Bin(_, a, b) => contains(a) || contains(b)
      case Un(_, a)     => contains(a)
      case Dot(a, _)    => contains(a)
      case Has(a, _)    => contains(a)
      case Index(a, b)  => contains(a) || contains(b)
      case Call(f, as)  => contains(f) || as.exists(contains)
      case Cast(a, _)   => contains(a)
      case Match(s, cs, d) =>
        contains(s) || cs.exists(c => contains(c._2)) || d.exists(contains)
      case _            => false
    }
    def replace(x: Expr): Expr = x match {
      case Placeholder  => Id("$p")
      case Bin(o, a, b) => Bin(o, replace(a), replace(b))
      case Un(o, a)     => Un(o, replace(a))
      case Dot(a, f)    => Dot(replace(a), f)
      case Has(a, f)    => Has(replace(a), f)
      case Index(a, b)  => Index(replace(a), replace(b))
      case Call(f, as)  => Call(replace(f), as.map(replace))
      case Cast(a, t)   => Cast(replace(a), t)
      case Match(s, cs, d) =>
        Match(replace(s), cs.map { case (p, b) => (p, replace(b)) },
          d.map(replace))
      case other        => other
    }
    if (contains(e)) Lambda(Seq(("$p", TAny)), TAny, replace(e)) else e
  }

  // keywords must not lex as identifiers
  private val keywords = Set("if", "elif", "else", "for", "in", "out", "let",
    "func", "proc", "type", "suppose", "match", "case", "throw", "not",
    "and", "or", "xor", "true", "false", "none", "input", "output",
    "script", "version", "as", "import", "export")
  private def name: Parser[String] =
    ident.filter(!keywords.contains(_)).withFailureMessage("identifier expected")

  // ---- types ----
  def tyLambda: Parser[UdType] =
    ("(" ~> repsep(lamParamTy, ",") <~ ")") ~ ("->" ~> ty) ^^ {
      case args ~ r => TLambda(args, r)
    }

  private def lamParamTy: Parser[UdType] =
    (name ~ (":" ~> ty) ^^ { case _ ~ t => t }) | ty

  def tyAtom: Parser[UdType] =
    ("Bool" ^^^ TBool | "Int" ^^^ TInt | "Float" ^^^ TFloat |
      "Point" ^^^ TPoint |
      ("String" | "Str") ^^^ TStr | "None" ^^^ TNone | "Any" ^^^ TAny |
      "U8" ^^^ TIntN(8, signed = false) |
      "U16" ^^^ TIntN(16, signed = false) |
      "U32" ^^^ TIntN(32, signed = false) |
      "I8" ^^^ TIntN(8, signed = true) |
      "I16" ^^^ TIntN(16, signed = true) |
      "I32" ^^^ TIntN(32, signed = true) |
      // U64 is range-HONEST: it rides as Long like Nat, so wire values
      // above Long.MaxValue are rejected at the boundary (msgpack's
      // uint64 decode raises likewise) instead of silently wrapping
      ("Nat" | "U64") ^^^ TIntN(64, signed = false) |
      "I64" ^^^ TInt |
      // Number = Int | Float (manual.md:91 tower alias)
      "Number" ^^^ TUnion(Seq(TInt, TFloat)) |
      "F32" ^^^ TFloat32 | // precision-honest float32 (manual.md:121)
      "F64" ^^^ TFloat) <~ not(ident) |
      strLit ^^ (s => TValue(unescape(s))) |
      "[" ~> ty <~ "]" ^^ TList |
      "Map" ~> ("[" ~> ty <~ "]" | "<" ~> ty <~ ">") ^^ TMap |
      // `{[Str]: T}` map-type sugar (README.md html example)
      "{" ~> ("[" ~> ty <~ "]") ~> (":" ~> ty) <~ opt(",") ~ "}" ^^ TMap |
      "{" ~> repsep(recMember, "," | ";") <~ opt("," | ";") ~ "}" ^^ { ms =>
        TRecord(ms.collect { case Left(f) => f },
          ms.collect { case Right(m) => m })
      } |
      tyLambda |
      "(" ~> rep1sep(ty, ",") <~ ")" ^^ {
        case Seq(t) => t
        case ts     => TTuple(ts)
      } |
      name ~ ("<" ~> rep1sep(ty, ",") <~ ">") ^^ {
        case n ~ as => TApply(n, as)   // generic application (TypeCons)
      } |
      name ^^ TRef

  /** field | method | const | static (grammar.lalrpop:156-167). */
  def recMember: Parser[Either[TField, RecMember]] =
    (kw("method") ~> name) ~ ("(" ~> repsep(param, ",") <~ ")") ~
      ("->" ~> ty) ~ blockValueBraced ^^ {
        case n ~ ps ~ r ~ b => Right(RecMember(n, MMethod, ps, r, b))
      } |
      (kw("static") ~> name) ~ ("(" ~> repsep(param, ",") <~ ")") ~
        ("->" ~> ty) ~ blockValueBraced ^^ {
        case n ~ ps ~ r ~ b => Right(RecMember(n, MStatic, ps, r, b))
      } |
      (kw("const") ~> name) ~ (":" ~> ty) ~ ("=" ~> expr) ^^ {
        case n ~ t ~ v => Right(RecMember(n, MConst, Nil, t, v))
      } |
      recField ^^ (Left(_))

  def recField: Parser[TField] =
    opt("field") ~> name ~ opt("?") ~ (":" ~> ty) ^^ {
      case n ~ q ~ t => TField(n, t, q.isDefined)
    }

  def ty: Parser[UdType] =
    rep1sep(tyPostfix, "|") ^^ (ts => if (ts.size == 1) ts.head else TUnion(ts))

  def tyPostfix: Parser[UdType] =
    tyAtom ~ rep("?") ^^ { case t ~ qs => qs.foldLeft(t)((a, _) => TOption(a)) }

  // ---- expressions ----
  def expr: Parser[Expr] = orExpr

  def orExpr: Parser[Expr] =
    andExpr ~ rep((kw("or") | kw("xor")) ~ andExpr) ^^ { case h ~ t =>
      t.foldLeft(h) {
        case (l, "or" ~ r) => Bin(Or, l, r)
        case (l, _ ~ r)    => Bin(Xor, l, r)
      }
    }

  def andExpr: Parser[Expr] =
    cmpExpr ~ rep(kw("and") ~> cmpExpr) ^^ { case h ~ t =>
      t.foldLeft(h)((l, r) => Bin(And, l, r))
    }

  def cmpExpr: Parser[Expr] =
    shiftExpr ~ opt(("<=" | ">=" | "==" | "!=" | "<" | ">") ~ shiftExpr) ^^ {
      case l ~ None => l
      case l ~ Some(op ~ r) => op match {
        case "<"  => Bin(Lt, l, r);  case ">"  => Bin(Gt, l, r)
        case "<=" => Bin(Lte, l, r); case ">=" => Bin(Gte, l, r)
        case "==" => Bin(Eq, l, r);  case _    => Bin(Neq, l, r)
      }
    }

  def shiftExpr: Parser[Expr] =
    addExpr ~ rep(("<<" | ">>") ~ addExpr) ^^ { case h ~ t =>
      t.foldLeft(h) {
        case (l, "<<" ~ r) => Bin(Shl, l, r)
        case (l, _ ~ r)    => Bin(Shr, l, r)
      }
    }

  def addExpr: Parser[Expr] =
    mulExpr ~ rep(("+" | "-") ~ mulExpr) ^^ { case h ~ t =>
      t.foldLeft(h) {
        case (l, "+" ~ r) => Bin(Add, l, r)
        case (l, _ ~ r)   => Bin(Sub, l, r)
      }
    }

  def mulExpr: Parser[Expr] =
    unaryExpr ~ rep(("*" | "/" | "%") ~ unaryExpr) ^^ { case h ~ t =>
      t.foldLeft(h) {
        case (l, "*" ~ r) => Bin(Mul, l, r)
        case (l, "/" ~ r) => Bin(Div, l, r)
        case (l, _ ~ r)   => Bin(Mod, l, r)
      }
    }

  def unaryExpr: Parser[Expr] =
    kw("not") ~> unaryExpr ^^ (Un(Not, _)) |
      "-" ~> postfixExpr ^^ (Un(Neg, _)) |
      "!" ~> unaryExpr ^^ identity | // `!` debug is a passthrough in exprs
      kw("throw") ~> expr ^^ ThrowE | // throw in value position (README)
      postfixExpr

  def postfixExpr: Parser[Expr] =
    atom ~ rep(postfixOp) ~ opt(kw("as") ~> ty) ^^ {
      case h ~ ops ~ cast =>
        val e = ops.foldLeft(h)((x, f) => f(x))
        cast.fold(e)(t => Cast(e, t))
    }

  private def callArg: Parser[Expr] =
    "$" ~ "..." ^^^ PlaceholderRest |
      "..." ~> expr ^^ Spread | expr

  private def postfixOp: Parser[Expr => Expr] =
    "(" ~> repsep(callArg, ",") <~ ")" ^^ (args => (e: Expr) =>
      if (args.contains(Placeholder) || args.contains(PlaceholderRest)) {
        // partial application: foo(1, $) => (p0) -> foo(1, p0);
        // a trailing $... becomes a rest param spread through to the callee
        var i = -1
        val filled = args.map {
          case Placeholder     => i += 1; Id(s"$$p$i")
          case PlaceholderRest => Spread(Id("$rest"))
          case a               => a
        }
        val ps = (0 to i).map(k => (s"$$p$k", TAny)) ++
          (if (args.contains(PlaceholderRest)) Seq(("...$rest", TAny))
           else Seq.empty)
        Lambda(ps, TAny, Call(e, filled))
      } else Call(e, args)) |
      ".?." ~> name ^^ (f => (e: Expr) => Has(e, f)) |
      "." ~> name ^^ (f => (e: Expr) => Dot(e, f)) |
      "[" ~> expr <~ "]" ^^ (i => (e: Expr) => Index(e, i))

  def atom: Parser[Expr] =
    floatLit ^^ (s => LitFloat(s.toDouble)) |
      intLit ^^ (s => LitInt(s.toLong)) |
      strLit ^^ (s => LitStr(unescape(s))) |
      """true\b""".r ^^^ LitBool(true) | """false\b""".r ^^^ LitBool(false) |
      """none\b""".r ^^^ LitNone |
      """in\b""".r ^^^ In |
      ifExpr | matchExpr | lambdaExpr |
      ("[" ~> expr ~ ("|" ~> expr) <~ "]") ^^ { case c ~ f =>
        Comprehension(c, desugarPlaceholder(f))
      } |
      "$" ^^^ Placeholder |
      "[" ~> repsep(expr, ",") <~ "]" ^^ ListExpr |
      "{" ~> repsep((name | strLit ^^ unescape) ~ (":" ~> expr), ",") <~ opt(",") ~ "}" ^^
      (es => MapExpr(es.map { case k ~ v => (k, v) })) |
      "(" ~> rep1sep(expr, ",") <~ ")" ^^ {
        case Seq(e) => e          // parenthesized expression
        case es     => TupleExpr(es)
      } |
      name ^^ Id

  def ifExpr: Parser[Expr] =
    (kw("if") ~> "(" ~> expr <~ ")") ~ blockValue ~
      rep((kw("elif") ~> "(" ~> expr <~ ")") ~ blockValue) ~
      (kw("else") ~> blockValue) ^^ { case c ~ t ~ elifs ~ e =>
      Cond((c, t) +: elifs.map { case cc ~ tt => (cc, tt) }, e)
    }

  def matchExpr: Parser[Expr] =
    (kw("match") ~> "(" ~> expr <~ ")") ~ ("{" ~> rep(matchCase) ~
      opt(kw("else") ~> "=>" ~> expr <~ ";") <~ "}") ^^ {
      case scrut ~ (cases ~ dflt) => Match(scrut, cases, dflt)
    }

  def matchCase: Parser[(Pattern, Expr)] =
    (kw("case") ~> pattern) ~ ("=>" ~> expr <~ ";") ^^ { case p ~ e => (p, e) }

  def pattern: Parser[Pattern] =
    strLit ^^ (s => PLitStr(unescape(s))) |
      intLit ^^ (s => PLitInt(s.toLong)) |
      ("Some" ~> "(" ~> name <~ ")") ^^ PSome |
      """none\b""".r ^^^ PNone |
      name ~ (":" ~> ty) ^^ { case n ~ t => PType(n, t) }

  /** lambda literal: (x: T) -> R = e | (x: T) -> R {block} | (x: T) {block}
    * (grammar.lalrpop:365-384). */
  def lambdaExpr: Parser[Expr] =
    ("(" ~> repsep(param, ",") <~ ")") ~ ("->" ~> ty) ~
      (("=" ~> expr) | blockValueBraced) ^^ {
      case ps ~ r ~ b => Lambda(ps, r, b)
    } |
      ("(" ~> repsep(param, ",") <~ ")") ~ blockValueBraced ^^ {
        case ps ~ b => Lambda(ps, TNone, b)
      }

  /** Rest parameter `...children: T` (README.md:335-336): encoded as a
    * "..."-prefixed name; only meaningful in last position — the callee
    * binds it to the list of remaining arguments. */
  def param: Parser[(String, UdType)] =
    "..." ~> name ~ (":" ~> ty) <~ opt(",") ^^ { case n ~ t => ("..." + n, t) } |
      name ~ (":" ~> ty) ^^ { case n ~ t => (n, t) }

  /** `{ stmts* expr? }` with a value result; statements-only blocks result
    * in none (proc bodies). */
  def blockValueBraced: Parser[Expr] =
    "{" ~> rep(stmt) ~ opt(expr <~ opt(";")) <~ "}" ^^ {
      case Nil ~ Some(e) => e
      case ss ~ Some(e)  => BlockExpr(ss, e)
      case ss ~ None     => BlockExpr(ss, LitNone)
    }

  def blockValue: Parser[Expr] = blockValueBraced | expr

  // ---- statements ----
  def stmt: Parser[Stmt] =
    kw("out") ~> expr <~ ";" ^^ OutStmt |
      kw("let") ~> name ~ ("=" ~> expr) <~ ";" ^^ { case n ~ e => LetStmt(n, e) } |
      // `type N: type = T;` (manual), `type N: T;` (README html lib), and
      // parametric `type N<T, U>: T;` (TypeFunc, ast.rs:205)
      (kw("type") ~> name) ~ opt("<" ~> rep1sep(name, ",") <~ ">") ~
        ((":" ~ "type" ~ "=" ~> ty) | (":" ~> ty)) <~ ";" ^^ {
        case n ~ ps ~ t => TypeDecl(n, t, ps.getOrElse(Nil))
      } |
      // `func add<T: Int>(x: T, y: T) -> T` (manual.md:118): function
      // type params erase to their BOUND (TAny when unbounded) in the
      // signature — the reference MVP's own checker is unwired, and
      // bounded erasure gives the documented example its semantics
      (kw("func") ~> name) ~
        opt("<" ~> rep1sep(name ~ opt(":" ~> ty), ",") <~ ">") ~
        ("(" ~> repsep(param, ",") <~ ")") ~
        ("->" ~> ty) ~ opt("!" ~> ty) ~ // `-> T ! E` (README.md:337-342)
        (("=" ~> expr <~ ";") | blockValueBraced) ^^ {
        case n ~ tps ~ ps ~ r ~ eff ~ b =>
          val bounds: Map[String, UdType] = tps.getOrElse(Nil).map {
            case tn ~ bound => tn -> bound.getOrElse(TAny)
          }.toMap
          def sub(t: UdType): UdType = t match {
            case TRef(x) if bounds.contains(x) => bounds(x)
            case TList(x)   => TList(sub(x))
            case TMap(x)    => TMap(sub(x))
            case TOption(x) => TOption(sub(x))
            case TTuple(xs) => TTuple(xs.map(sub))
            case TUnion(xs) => TUnion(xs.map(sub))
            case TRecord(fs, ms) =>
              TRecord(fs.map(f => f.copy(t = sub(f.t))), ms)
            case TLambda(as, rr) => TLambda(as.map(sub), sub(rr))
            case other => other
          }
          FuncStmt(n, ps.map { case (pn, pt) => (pn, sub(pt)) }, sub(r), b,
            eff.map(sub))
      } |
      (kw("proc") ~> name) ~ ("(" ~> repsep(param, ",") <~ ")") ~ blockValueBraced ^^ {
        case n ~ ps ~ b => FuncStmt(n, ps, TNone, b)
      } |
      (kw("for") ~> "(" ~> name ~ ("," ~> name) <~ ")") ~ (kw("in") ~> expr) ~ stmtBlock ^^ {
        case k ~ v ~ c ~ b => ForKvStmt(k, v, c, b)
      } |
      (kw("for") ~> name) ~ (kw("in") ~> expr) ~ stmtBlock ^^ {
        case v ~ c ~ b => ForStmt(v, c, b)
      } |
      (kw("suppose") ~> "(" ~> expr <~ ")") ~ stmtBlock ~ (kw("else") ~> stmtBlock) ^^ {
        case d ~ br ~ lf => SupposeStmt(d, br, lf)
      } |
      "..." ~ ";" ^^^ SpliceStmt |
      ("import" ~> name) ~ opt("." ~> importSel) <~ ";" ^^ {
        case l ~ s => ImportStmt(l, s)
      } |
      // D12 template call: foo(args) { block } — trailing block becomes the
      // final (zero-arg) closure argument (grammar.lalrpop:219-229)
      (name ~ ("(" ~> repsep(callArg, ",") <~ ")") ~ stmtBlock) ^^ {
        case f ~ args ~ blk =>
          ExprStmt(Call(Id(f), args :+ Lambda(Seq.empty, TNone,
            BlockExpr(blk, LitNone))))
      } |
      kw("throw") ~> expr <~ ";" ^^ ThrowStmt |
      "!" ~> expr <~ ";" ^^ DebugStmt |
      ifStmt |
      expr <~ ";" ^^ ExprStmt

  def ifStmt: Parser[Stmt] =
    (kw("if") ~> "(" ~> expr <~ ")") ~ stmtBlock ~
      rep((kw("elif") ~> "(" ~> expr <~ ")") ~ stmtBlock) ~
      opt(kw("else") ~> stmtBlock) ^^ { case c ~ t ~ elifs ~ e =>
      IfStmt((c, t) +: elifs.map { case cc ~ tt => (cc, tt) },
        e.getOrElse(Nil))
    }

  def stmtBlock: Parser[Seq[Stmt]] = "{" ~> rep(stmt) <~ "}"

  /** Import selectors (grammar.lalrpop:182-195): `_` the module itself,
    * `*` all exports, `item`, `item as alias`, `item.nested`, `{a, b}`. */
  def importSel: Parser[ImportSel] =
    "_" ^^^ SelItself |
      "*" ^^^ SelAll |
      "{" ~> rep1sep(importSel, ",") <~ "}" ^^ SelGroup |
      name ~ ("." ~> importSel) ^^ { case n ~ s => SelNested(n, s) } |
      name ~ opt(kw("as") ~> name) ^^ { case n ~ a => SelItem(n, a) }

  // ---- program ----
  private sealed trait TopItem
  private final case class TI(t: UdType) extends TopItem
  private final case class TO(t: UdType) extends TopItem
  private final case class TS(s: Stmt) extends TopItem

  private def topItem: Parser[TopItem] =
    kw("input") ~> ty <~ ";" ^^ TI |
      kw("output") ~> ty <~ ";" ^^ TO |
      stmt ^^ TS

  /** Does an expression (or statement) reference the current input? */
  private def refsIn(e: Expr): Boolean = e match {
    case In => true
    case Bin(_, a, b)  => refsIn(a) || refsIn(b)
    case Un(_, a)      => refsIn(a)
    case Cond(cs, o)   => cs.exists(c => refsIn(c._1) || refsIn(c._2)) || refsIn(o)
    case BlockExpr(ss, r) => ss.exists(stmtRefsIn) || refsIn(r)
    case Lambda(_, _, b)  => refsIn(b)
    case Call(f, as)   => refsIn(f) || as.exists(refsIn)
    case Dot(a, _)     => refsIn(a)
    case Has(a, _)     => refsIn(a)
    case Index(a, b)   => refsIn(a) || refsIn(b)
    case ListExpr(es)  => es.exists(refsIn)
    case TupleExpr(es) => es.exists(refsIn)
    case MapExpr(es)   => es.exists(e2 => refsIn(e2._2))
    case Match(s, cs, d) =>
      refsIn(s) || cs.exists(c => refsIn(c._2)) || d.exists(refsIn)
    case Comprehension(c, f) => refsIn(c) || refsIn(f)
    case Cast(a, _)    => refsIn(a)
    case Spread(a)     => refsIn(a)
    case ThrowE(a)     => refsIn(a)
    case _             => false
  }
  private def stmtRefsIn(s: Stmt): Boolean = s match {
    case OutStmt(e)        => refsIn(e)
    case LetStmt(_, e)     => refsIn(e)
    case FuncStmt(_, _, _, b, _) => refsIn(b)
    case ForStmt(_, c, b)  => refsIn(c) || b.exists(stmtRefsIn)
    case ForKvStmt(_, _, c, b) => refsIn(c) || b.exists(stmtRefsIn)
    case IfStmt(cs, o) =>
      cs.exists(c => refsIn(c._1) || c._2.exists(stmtRefsIn)) ||
        o.exists(stmtRefsIn)
    case SupposeStmt(d, br, lf) =>
      refsIn(d) || br.exists(stmtRefsIn) || lf.exists(stmtRefsIn)
    case ExprStmt(e)   => refsIn(e)
    case DebugStmt(e)  => refsIn(e)
    case ThrowStmt(e)  => refsIn(e)
    case _             => false
  }

  def program: Parser[Script] =
    opt(kw("version") ~> """[^;]+""".r <~ ";") ~>
      (kw("script") ~> strLit <~ ";") ~ rep(topItem) ^^ { case desc ~ items =>
      val in = items.collectFirst { case TI(t) => t }
        .getOrElse(TAny)
      val out = items.collectFirst { case TO(t) => t }
        .getOrElse(TAny)
      val stmts = items.collect { case TS(s) => s }
      // block split (ir.rs:746-773, grammar.lalrpop:41-47): decl-kind
      // statements are init-block ONLY when they don't reference `in` —
      // an input-free let/func/type/import evaluates to the same value
      // every record, so hoisting it to init is semantics-preserving (the
      // reference's examples freely mix decl order around the IO decls).
      // A body-level `let y = in;` (parser.rs:804) stays per-record.
      val (decls, body) = stmts.partition {
        case s @ (_: LetStmt | _: FuncStmt | _: TypeDecl | _: ImportStmt) =>
          !stmtRefsIn(s)
        case _ => false
      }
      Script(unescape(desc), in, out, decls, body)
    }

  /** Library decl: everything a script decl can be, plus the bare
    * `export name = expr;` form of the README html library. */
  private def libDecl: Parser[Stmt] =
    opt(kw("export")) ~> (
      (name ~ ("=" ~> expr) <~ ";") ^^ { case n ~ e => LetStmt(n, e) } |||
        stmt)

  /** Parse a decl-only library source (F11): optional `version`/`lib`
    * headers, then exports. `export` markers are accepted and recorded as
    * "everything is exported" (selector filtering happens at import). */
  def parseDecls(src: String): Either[String, Seq[Stmt]] =
    parseAll(
      opt(kw("version") ~> """[^;]+""".r <~ ";") ~>
        opt(kw("lib") ~> strLit <~ ";") ~> rep(libDecl), src) match {
      case Success(ss, _) => Right(ss)
      case NoSuccess(m, rest) =>
        Left(s"parse error at line ${rest.pos.line}: $m")
      case other => Left(other.toString)
    }

  /** Parse one bare expression (the CLI's `--dump-expr` REPL). */
  def parseExprStr(src: String): Either[String, Expr] =
    parseAll(expr, src) match {
      case Success(e, _) => Right(e)
      case NoSuccess(m, rest) =>
        Left(s"parse error at col ${rest.pos.column}: $m")
      case other => Left(other.toString)
    }

  def parse(src: String): Either[String, Script] =
    parseAll(program, src) match {
      case Success(s, _) => Right(s)
      case NoSuccess(m, rest) =>
        Left(s"parse error at line ${rest.pos.line}, col ${rest.pos.column}: $m")
      case other => Left(other.toString)
    }
}
