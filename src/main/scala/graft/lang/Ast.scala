package graft.lang

/** uDLang AST — the declared capability surface of the reference
  * (ast.rs:166-309, grammar.lalrpop), re-expressed as Scala ADTs.
  * This is a clean-room model of the documented language, not a port:
  * only the shapes needed to type and lower scripts are kept.
  */
object Ast {

  // ---- types (ast.rs:166-206, manual.md:85-121) ----
  sealed trait UdType
  case object TBool extends UdType
  case object TInt extends UdType
  /** Sized integer of the documented numeric tower (manual.md:85-97):
    * U8/U16/U32, I8/I16/I32, Nat/U64 (bits=64, unsigned ⇒ non-negative
    * Long; values above Long.MaxValue are REJECTED at boundaries, never
    * wrapped). Rides as Long at the schema level; the declared range is
    * enforced at kernel boundaries (ingest, casts, declared params) —
    * I64 maps to plain TInt (Long width). */
  final case class TIntN(bits: Int, signed: Boolean) extends UdType {
    def lo: Long = if (signed) -(1L << (bits - 1)) else 0L
    def hi: Long =
      if (bits >= 64) Long.MaxValue
      else if (signed) (1L << (bits - 1)) - 1
      else (1L << bits) - 1
    def contains(v: Long): Boolean = v >= lo && v <= hi
  }
  case object TFloat extends UdType
  /** F32 (manual.md:121, README.md:174-176): statically interchangeable
    * with Float (the reference MVP collapses the tower, ast.rs:174-175)
    * but PRECISION-HONEST at runtime boundaries — `x as F32` and declared
    * F32 fields round through float32, the float twin of TIntN's range
    * checks. Rides as Double on the wire/in Spark. */
  case object TFloat32 extends UdType
  /** pair of floats (TypeTag::Point, ir.rs:318; ast.rs:177) */
  case object TPoint extends UdType
  case object TStr extends UdType
  case object TNone extends UdType
  case object TAny extends UdType
  final case class TOption(t: UdType) extends UdType
  final case class TList(t: UdType) extends UdType
  final case class TMap(v: UdType) extends UdType // string keys (ir.rs:268)
  final case class TTuple(ts: Seq[UdType]) extends UdType
  /** field? (absent-optional) vs T? (nullable) both surface as Option
    * in-script but are distinct at schema level (README.md:220-228). */
  final case class TField(name: String, t: UdType, absentOptional: Boolean)

  /** Record type members beyond fields (grammar.lalrpop:156-167,
    * ast.rs:211-217; vtables ir.rs:339-345): instance methods (dispatch on
    * a record value, body sees fields via `self`), statics and consts
    * (accessed through the TYPE name as a namespace). */
  sealed trait MemberKind
  case object MMethod extends MemberKind
  case object MStatic extends MemberKind
  case object MConst extends MemberKind
  final case class RecMember(name: String, kind: MemberKind,
                             params: Seq[(String, UdType)], ret: UdType,
                             body: Expr)
  final case class TRecord(fields: Seq[TField],
                           members: Seq[RecMember] = Nil) extends UdType
  final case class TUnion(ts: Seq[UdType]) extends UdType
  final case class TLambda(args: Seq[UdType], ret: UdType) extends UdType
  /** ValueType: string-literal lifted to type level (manual.md:97). */
  final case class TValue(lit: String) extends UdType
  /** Named type reference, resolved by the typechecker. */
  final case class TRef(name: String) extends UdType
  /** Generic type application `Name<T, U>` (TypeCons, ast.rs:203) —
    * resolved against a parametric TypeDecl (TypeFunc, ast.rs:205). */
  final case class TApply(name: String, args: Seq[UdType]) extends UdType

  // ---- operators (§2.3 of SURVEY; ast.rs:140-156) ----
  sealed trait BinOp
  case object Add extends BinOp; case object Sub extends BinOp
  case object Mul extends BinOp; case object Div extends BinOp
  case object Mod extends BinOp; case object Pow extends BinOp
  case object Min extends BinOp; case object Max extends BinOp
  case object And extends BinOp; case object Or extends BinOp
  case object Xor extends BinOp
  case object Shl extends BinOp; case object Shr extends BinOp
  case object Lt extends BinOp; case object Gt extends BinOp
  case object Lte extends BinOp; case object Gte extends BinOp
  case object Eq extends BinOp; case object Neq extends BinOp

  sealed trait UnOp
  case object Not extends UnOp; case object Neg extends UnOp
  case object Abs extends UnOp

  // ---- expressions ----
  sealed trait Expr
  final case class LitInt(v: Long) extends Expr
  final case class LitFloat(v: Double) extends Expr
  final case class LitStr(v: String) extends Expr
  final case class LitBool(v: Boolean) extends Expr
  case object LitNone extends Expr
  case object In extends Expr                       // current input record
  final case class Id(name: String) extends Expr
  final case class Bin(op: BinOp, l: Expr, r: Expr) extends Expr
  final case class Un(op: UnOp, e: Expr) extends Expr
  final case class Cond(cases: Seq[(Expr, Expr)], otherwise: Expr) extends Expr
  final case class BlockExpr(stmts: Seq[Stmt], result: Expr) extends Expr
  final case class Lambda(params: Seq[(String, UdType)], ret: UdType,
                          body: Expr) extends Expr
  final case class Call(f: Expr, args: Seq[Expr]) extends Expr
  final case class Dot(e: Expr, field: String) extends Expr
  final case class Has(e: Expr, field: String) extends Expr   // rec.?.field
  final case class Index(e: Expr, i: Expr) extends Expr       // 0-based
  final case class ListExpr(es: Seq[Expr]) extends Expr
  /** fixed-length heterogeneous tuple literal `(a, b)` (manual.md:101-104;
    * Value::Tuple ir.rs:287). */
  final case class TupleExpr(es: Seq[Expr]) extends Expr
  final case class MapExpr(entries: Seq[(String, Expr)]) extends Expr
  /** match with literal + type patterns (README.md:124-137, DOC-level). */
  final case class Match(scrutinee: Expr, cases: Seq[(Pattern, Expr)],
                         default: Option[Expr]) extends Expr
  /** comprehension `[coll | f]` (README.md:171-177): map coll through f. */
  final case class Comprehension(coll: Expr, fn: Expr) extends Expr
  /** explicit cast `x as T` (README.md:174-176; Coerce, ir.rs:205). */
  final case class Cast(e: Expr, t: UdType) extends Expr
  /** partial-application placeholder `$` (grammar.lalrpop:504-507);
    * desugared to a lambda at parse time, never reaches the checker. */
  case object Placeholder extends Expr
  /** `$...` — capture-and-spread rest arguments in a partial application
    * (README.md:378-380); only valid as the last argument. */
  case object PlaceholderRest extends Expr

  sealed trait Pattern
  final case class PLitStr(v: String) extends Pattern
  final case class PLitInt(v: Long) extends Pattern
  final case class PType(binder: String, t: UdType) extends Pattern
  /** destructuring over Option (README.md:235-239): case Some(x) / none. */
  final case class PSome(binder: String) extends Pattern
  case object PNone extends Pattern

  // ---- statements ----
  sealed trait Stmt
  final case class OutStmt(e: Expr) extends Stmt
  final case class LetStmt(name: String, e: Expr) extends Stmt
  /** func f(a: T, ...) -> R { body } — sugar for let f = lambda
    * (ast.rs:527-541); proc = func returning None. `effect` is the
    * declared exception type of `-> R ! E` (README.md:337-342): the
    * checker verifies every `throw` payload in the body against it. */
  final case class FuncStmt(name: String, params: Seq[(String, UdType)],
                            ret: UdType, body: Expr,
                            effect: Option[UdType] = None) extends Stmt
  final case class ForStmt(v: String, coll: Expr, body: Seq[Stmt]) extends Stmt
  final case class ForKvStmt(k: String, v: String, coll: Expr,
                             body: Seq[Stmt]) extends Stmt
  final case class IfStmt(cases: Seq[(Expr, Seq[Stmt])],
                          otherwise: Seq[Stmt]) extends Stmt
  /** suppose (delegate) { branch with ...; } else { leaf } (vm.rs:602-638).
    */
  final case class SupposeStmt(delegate: Expr, branch: Seq[Stmt],
                               leaf: Seq[Stmt]) extends Stmt
  case object SpliceStmt extends Stmt               // `...;` inside branch
  final case class ExprStmt(e: Expr) extends Stmt
  final case class DebugStmt(e: Expr) extends Stmt  // `! expr`
  final case class ThrowStmt(e: Expr) extends Stmt
  /** `throw E` in VALUE position (README.md:337-350: a branch of an
    * if/elif expression may throw instead of yielding) — a diverging
    * expression; types as ⊥ (TAny) so the other branches pick the type. */
  final case class ThrowE(e: Expr) extends Expr
  /** `type N: T;` — with `params` nonempty it is a parametric type
    * (TypeFunc): `type Pair<T>: (T, T);`. */
  final case class TypeDecl(name: String, t: UdType,
                            params: Seq[String] = Nil) extends Stmt
  /** Import selectors (grammar.lalrpop:171-195, ast.rs:263-289). */
  sealed trait ImportSel
  case object SelItself extends ImportSel                       // lib._
  case object SelAll extends ImportSel                          // lib.*
  final case class SelItem(name: String,
                           alias: Option[String]) extends ImportSel
  final case class SelNested(item: String, sel: ImportSel) extends ImportSel
  final case class SelGroup(sels: Seq[ImportSel]) extends ImportSel

  /** import a named library's decls (F11); resolved from the compile-time
    * registry or library search dirs (file-system resolution). */
  final case class ImportStmt(lib: String,
                              sel: Option[ImportSel] = None) extends Stmt
  /** call-site spread `...expr` (F7): splices a list into the arg vector. */
  final case class Spread(e: Expr) extends Expr

  /** A parsed script: metadata + init-block decls + per-record body
    * (ir.rs:746-773 block split). */
  final case class Script(desc: String, input: UdType, output: UdType,
                          decls: Seq[Stmt], body: Seq[Stmt])
}
