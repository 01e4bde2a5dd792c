package graft.lang

import graft.kernel.{Emitter, Kernel}
import Ast._
import Values._
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compile + run uDLang scripts on Spark — the engine's front door.
  *
  * Pipeline (SURVEY.md §7.1): parse → typecheck → lower. Lowering is
  * two-tier:
  *
  *  - COLUMN tier: bodies consisting of conditional/unconditional `out` of
  *    pure expressions lower to native select/filter/when plans — function
  *    calls are inlined (the reference's planned partial-evaluation pass,
  *    stackfolder.py, realized as Catalyst expressions: constant folding,
  *    CSE and pushdown then come free). Recursion blocks inlining and
  *    falls back to the kernel tier.
  *  - KERNEL tier: everything else (recursion, for-loops with multi-emit,
  *    suppose/capture, closures) runs the Interp evaluator inside a typed
  *    flatMap — still distributed, pipelined, shuffle-free.
  *
  * The declared input/output types become the DataFrame schemas: records
  * map to StructType columns; scalar input reads the single column of the
  * input frame; scalar output is a single `out` column.
  */
object UdScript {

  final case class CompileError(msg: String) extends RuntimeException(msg)

  sealed trait Tier
  case object ColumnTier extends Tier
  case object KernelTier extends Tier

  final case class Compiled(script: Script, tier: Tier,
                            typeErrors: Seq[Typechecker.TypeError],
                            libs: Map[String, Values.Value] = Map.empty) {
    val inputSchema: StructType = schemaOf(script.input)
    val outputSchema: StructType = schemaOf(script.output)

    /** Run over a DataFrame whose columns match the declared input. */
    def run(df: DataFrame): DataFrame = tier match {
      case ColumnTier => Lowering.runColumn(script, df)
      case KernelTier => Lowering.runKernel(script, df, libs)
    }
  }

  /** Compile a script. strict=false downgrades type errors to warnings
    * (the reference ships examples its own unwired checker would reject —
    * e.g. Int passed to Float params). */
  def compile(src: String, strict: Boolean = true,
              libraries: Map[String, String] = Map.empty): Compiled = {
    val script = UdParser.parse(src) match {
      case Right(s) => s
      case Left(m)  => throw CompileError(m)
    }
    val errs = Typechecker.check(script)
    if (strict && errs.nonEmpty)
      throw CompileError(errs.map(_.msg).mkString("; "))
    val libs = libraries.map { case (name, lsrc) =>
      name -> compileLibrary(lsrc)
    }
    val tier =
      if (Lowering.columnExpressible(script)) ColumnTier else KernelTier
    Compiled(script, tier, errs, libs)
  }

  /** Compile a library (decl-only source) to a module value: its top-level
    * decls evaluated once, exposed as an insertion-ordered record (F11;
    * the reference parses imports but never compiles them, ir.rs:802-803).
    */
  def compileLibrary(src: String): Values.Value = {
    val stmts = UdParser.parseDecls(src) match {
      case Right(ss) => ss
      case Left(m)   => throw CompileError(s"library: $m")
    }
    val pseudo = Script("library", TAny, TAny, stmts, Seq.empty)
    val interp = new Interp(pseudo)
    val env = interp.initEnv
    Values.VMap(env.vars.toVector.sortBy(_._1))
  }

  // ---- declared type → Spark schema ----
  def sparkType(t: UdType): DataType = t match {
    case TBool     => BooleanType
    case TInt      => LongType
    case TFloat    => DoubleType
    case TStr      => StringType
    case TNone     => NullType
    case TAny      => StringType // Any rides as JSON-ish string
    case TValue(_) => StringType
    case TOption(x) => sparkType(x)
    case TList(x)  => ArrayType(sparkType(x))
    case TMap(v)   => MapType(StringType, sparkType(v))
    case TTuple(ts) => StructType(ts.zipWithIndex.map { case (x, i) =>
      StructField(s"_${i + 1}", sparkType(x))
    })
    case TRecord(fs) => StructType(fs.map(f =>
      StructField(f.name, sparkType(f.t),
        nullable = f.absentOptional || f.t.isInstanceOf[TOption])))
    case TUnion(ts) if ts.forall(_.isInstanceOf[TValue]) => StringType
    case TUnion(_) => StringType
    case TLambda(_, _) => throw CompileError("function type has no schema")
    case other => throw CompileError(s"no schema for $other")
  }

  def schemaOf(t: UdType): StructType = t match {
    case TRecord(fs) => StructType(fs.map(f =>
      StructField(f.name, sparkType(f.t),
        nullable = f.absentOptional || f.t.isInstanceOf[TOption])))
    case scalar => StructType(Seq(StructField("out", sparkType(scalar))))
  }

  // ---- Row <-> Value ----
  def rowToValue(row: Row, t: UdType): Value = t match {
    case TRecord(fs) =>
      VMap(fs.map { f =>
        val i = row.fieldIndex(f.name)
        f.name -> (if (row.isNullAt(i)) VNone
        else anyToValue(row.get(i), f.t))
      }.toVector)
    case scalar => if (row.isNullAt(0)) VNone else anyToValue(row.get(0), scalar)
  }

  def anyToValue(a: Any, t: UdType): Value = (a, t) match {
    case (null, _)          => VNone
    case (x: Long, _)       => VInt(x)
    case (x: Int, _)        => VInt(x.toLong)
    case (x: Short, _)      => VInt(x.toLong)
    case (x: Double, _)     => VFloat(x)
    case (x: Float, _)      => VFloat(x.toDouble)
    case (x: Boolean, _)    => VBool(x)
    case (x: String, _)     => VStr(x)
    case (x: scala.collection.Seq[_], TList(et)) => // Rows use mutable.ArraySeq
      VList(x.map(anyToValue(_, et)).toVector)
    case (x: Row, rt: TRecord)  => rowToValue(x, rt)
    case (x: Map[_, _], TMap(vt)) =>
      VMap(x.toVector.map { case (k, v) =>
        k.toString -> anyToValue(v, vt)
      }.sortBy(_._1))
    case (x, _) => VStr(String.valueOf(x))
  }

  def valueToAny(v: Value, dt: DataType): Any = (v, dt) match {
    case (VNone, _)            => null
    case (VInt(i), LongType)   => i
    case (VInt(i), DoubleType) => i.toDouble
    case (VFloat(d), DoubleType) => d
    case (VBool(b), BooleanType) => b
    case (VStr(s), StringType) => s
    case (v2, StringType)      => render(v2)
    case (VList(xs), ArrayType(et, _)) => xs.map(valueToAny(_, et))
    case (m: VMap, st: StructType) =>
      Row.fromSeq(st.fields.toSeq.map(f =>
        m.index.get(f.name).map(valueToAny(_, f.dataType)).orNull))
    case (m: VMap, MapType(_, vt, _)) =>
      m.entries.map { case (k, x) => k -> valueToAny(x, vt) }.toMap
    case (VFloat(d), LongType) => d.toLong // declared-boundary narrow
    case _ => throw CompileError(s"cannot encode ${render(v)} as $dt")
  }

  def valueToRow(v: Value, t: UdType, schema: StructType): Row = t match {
    case TRecord(_) => valueToAny(v, schema).asInstanceOf[Row]
    case _          => Row(valueToAny(v, schema.fields(0).dataType))
  }
}

/** The two lowering paths. */
private[lang] object Lowering {
  import UdScript._

  /** Column-tier eligibility: body is a sequence of OutStmt / IfStmt
    * (whose blocks contain only OutStmt/IfStmt), and every expression is
    * pure + inlinable (no recursion, no lambdas-as-values, no suppose). */
  def columnExpressible(script: Script): Boolean = {
    val funcs: Map[String, FuncStmt] = script.decls.collect {
      case f: FuncStmt => f.name -> f
    }.toMap
    val lets: Map[String, Expr] = script.decls.collect {
      case LetStmt(n, e) => n -> e
    }.toMap

    def exprOk(e: Expr, stack: Set[String], bound: Set[String]): Boolean =
      e match {
        case _: LitInt | _: LitFloat | _: LitStr | _: LitBool | LitNone | In =>
          true
        case Id(n) =>
          bound.contains(n) || lets.get(n).exists(exprOk(_, stack, bound))
        case Bin(_, l, r) => exprOk(l, stack, bound) && exprOk(r, stack, bound)
        case Un(_, x)     => exprOk(x, stack, bound)
        case Cond(cs, o) =>
          cs.forall { case (c, t) =>
            exprOk(c, stack, bound) && exprOk(t, stack, bound)
          } && exprOk(o, stack, bound)
        case Dot(x, _)  => exprOk(x, stack, bound)
        case Has(x, _)  => exprOk(x, stack, bound)
        case Index(x, i) => exprOk(x, stack, bound) && exprOk(i, stack, bound)
        case Call(Id(n), args)
            if Seq("sqrt", "cos", "sin", "floor", "ceil").contains(n) &&
              !funcs.contains(n) =>
          args.forall(exprOk(_, stack, bound))
        case Call(Id(n), args) =>
          funcs.get(n) match {
            case Some(f) if !stack.contains(n) => // recursion ⇒ kernel tier
              args.forall(exprOk(_, stack, bound)) &&
                exprOk(f.body, stack + n, bound ++ f.params.map(_._1))
            case _ => false
          }
        case Match(s, cs, d) =>
          exprOk(s, stack, bound) &&
            cs.forall(c => exprOk(c._2, stack, bound)) &&
            d.forall(exprOk(_, stack, bound))
        case MapExpr(entries) =>
          entries.forall { case (_, v) => exprOk(v, stack, bound) }
        case Cast(x, _) => exprOk(x, stack, bound)
        case Comprehension(c, Lambda(ps, _, b)) =>
          exprOk(c, stack, bound) &&
            exprOk(b, stack, bound ++ ps.map(_._1))
        case BlockExpr(Seq(), result) => exprOk(result, stack, bound)
        case _ => false
      }

    def stmtOk(s: Stmt): Boolean = s match {
      case OutStmt(e)     => exprOk(e, Set.empty, Set.empty)
      case IfStmt(cs, o)  =>
        cs.forall { case (c, blk) =>
          exprOk(c, Set.empty, Set.empty) && blk.forall(stmtOk)
        } && o.forall(stmtOk)
      case _ => false
    }

    script.body.nonEmpty && script.body.forall(stmtOk) &&
      countOuts(script.body) >= 1
  }

  private def countOuts(ss: Seq[Stmt]): Int = ss.map {
    case _: OutStmt    => 1
    case IfStmt(cs, o) => cs.map(c => countOuts(c._2)).sum + countOuts(o)
    case _             => 0
  }.sum

  /** Lower to a native plan: each control path contributes a (guard,
    * value) pair; single-path → filter+project, multi-path → union. */
  def runColumn(script: Script, df: DataFrame): DataFrame = {
    val funcs: Map[String, FuncStmt] = script.decls.collect {
      case f: FuncStmt => f.name -> f
    }.toMap
    val lets: Map[String, Expr] = script.decls.collect {
      case LetStmt(n, e) => n -> e
    }.toMap

    def colOf(e: Expr, binds: Map[String, Column]): Column = e match {
      case LitInt(v)   => lit(v)
      case LitFloat(v) => lit(v)
      case LitStr(v)   => lit(v)
      case LitBool(v)  => lit(v)
      case LitNone     => lit(null)
      case In => script.input match {
        case TRecord(_) => struct(df.columns.map(df(_)).toSeq: _*)
        case _          => df(df.columns.head)
      }
      case Dot(In, field) => df(field)
      case Dot(x, field)  => colOf(x, binds).getField(field)
      case Has(x, field)  => colOf(x, binds).getField(field).isNotNull
      case Id(n) =>
        binds.getOrElse(n,
          lets.get(n).map(colOf(_, binds)).getOrElse(
            throw CompileError(s"unbound in column tier: $n")))
      case Bin(op, l, r) =>
        val (a, b) = (colOf(l, binds), colOf(r, binds))
        op match {
          case Add =>
            if (isStrTyped(l, r)) concat(a, b) else a + b
          case Sub => a - b
          case Mul => a * b
          case Div =>
            if (isIntExpr(l) && isIntExpr(r)) call_function("div", a, b)
            else a / b
          case Mod => a % b
          case Pow => pow(a, b)
          case Min => least(a, b)
          case Max => greatest(a, b)
          case And => a && b
          case Or  => a || b
          case Xor => a =!= b
          case Shl | Shr => throw CompileError("shift needs literal in column tier")
          case Lt => a < b;   case Gt => a > b
          case Lte => a <= b; case Gte => a >= b
          case Eq => a <=> b; case Neq => !(a <=> b)
        }
      case Un(Not, x) => !colOf(x, binds)
      case Un(Neg, x) => -colOf(x, binds)
      case Un(Abs, x) => abs(colOf(x, binds))
      case Cond(cases, otherwise) =>
        val w = cases.foldLeft[Option[Column]](None) {
          case (None, (c, t)) =>
            Some(when(colOf(c, binds), colOf(t, binds)))
          case (Some(acc), (c, t)) =>
            Some(acc.when(colOf(c, binds), colOf(t, binds)))
        }
        w.get.otherwise(colOf(otherwise, binds))
      case Index(x, LitInt(i)) => element_at(colOf(x, binds), i.toInt + 1)
      case MapExpr(entries) => // record literal → struct
        struct(entries.map { case (k, v) => colOf(v, binds).as(k) }: _*)
      case Cast(x, t) => colOf(x, binds).cast(sparkType(t))
      case Comprehension(c, Lambda(Seq((p, _)), _, body)) =>
        transform(colOf(c, binds), x => colOf(body, binds + (p -> x)))
      case Call(Id("sqrt"), Seq(a)) => sqrt(colOf(a, binds).cast(DoubleType))
      case Call(Id("cos"), Seq(a))  => cos(colOf(a, binds).cast(DoubleType))
      case Call(Id("sin"), Seq(a))  => sin(colOf(a, binds).cast(DoubleType))
      case Call(Id("floor"), Seq(a)) =>
        floor(colOf(a, binds).cast(DoubleType)).cast(DoubleType)
      case Call(Id("ceil"), Seq(a)) =>
        ceil(colOf(a, binds).cast(DoubleType)).cast(DoubleType)
      case Call(Id(n), args) =>
        val f = funcs.getOrElse(n,
          throw CompileError(s"unknown func in column tier: $n"))
        val argCols = f.params.zip(args).map { case ((pn, pt), a) =>
          val c = colOf(a, binds)
          // declared-boundary widening (Int arg to Float param)
          pn -> (if (pt == TFloat) c.cast(DoubleType) else c)
        }.toMap
        colOf(f.body, binds ++ argCols)
      case Match(scrut, cases, default) =>
        val sc = colOf(scrut, binds)
        val w = cases.foldLeft[Option[Column]](None) {
          case (acc, (p, body)) =>
            val cond = p match {
              case PLitStr(v) => sc === lit(v)
              case PLitInt(v) => sc === lit(v)
              case PType(_, _) =>
                throw CompileError("type pattern needs kernel tier")
            }
            val bv = colOf(body, binds)
            Some(acc.fold(when(cond, bv))(_.when(cond, bv)))
        }
        default match {
          case Some(d) => w.get.otherwise(colOf(d, binds))
          case None    => w.get
        }
      case BlockExpr(Seq(), result) => colOf(result, binds)
      case other =>
        throw CompileError(s"not column-expressible: $other")
    }

    def isStrTyped(l: Expr, r: Expr): Boolean = {
      def isStr(e: Expr): Boolean = e match {
        case LitStr(_) => true
        case In        => script.input == TStr ||
          script.input.isInstanceOf[TValue] || (script.input match {
            case TUnion(ts) => ts.forall(_.isInstanceOf[TValue])
            case _          => false
          })
        case Bin(Add, a, b) => isStr(a) || isStr(b)
        case Dot(In, f) => script.input match {
          case TRecord(fs) => fs.exists(x => x.name == f &&
            (x.t == TStr || x.t.isInstanceOf[TValue]))
          case _ => false
        }
        case _ => false
      }
      isStr(l) || isStr(r)
    }

    def isIntExpr(e: Expr): Boolean = e match {
      case LitInt(_) => true
      case In        => script.input == TInt
      case Dot(In, f) => script.input match {
        case TRecord(fs) => fs.exists(x => x.name == f && x.t == TInt)
        case _ => false
      }
      case Bin(Add | Sub | Mul | Div | Mod, a, b) => isIntExpr(a) && isIntExpr(b)
      case _ => false
    }

    // collect control paths: (guard, outExpr)
    def paths(ss: Seq[Stmt], guard: Option[Column]): Seq[(Option[Column], Expr)] =
      ss.flatMap {
        case OutStmt(e) => Seq((guard, e))
        case IfStmt(cases, otherwise) =>
          var notPrev: Option[Column] = None
          val branchPaths = cases.flatMap { case (c, blk) =>
            val cc = colOf(c, Map.empty)
            val g = Seq(guard, notPrev, Some(cc)).flatten.reduce(_ && _)
            notPrev = Some(notPrev.fold(!cc)(np => np && !cc))
            paths(blk, Some(g))
          }
          val elsePaths =
            if (otherwise.isEmpty) Seq.empty
            else {
              val g = Seq(guard, notPrev).flatten
                .reduceOption(_ && _)
              paths(otherwise, g.orElse(Some(lit(true))))
            }
          branchPaths ++ elsePaths
        case _ => Seq.empty
      }

    val allPaths = paths(script.body, None)
    val outSchema = schemaOf(script.output)
    def project(p: (Option[Column], Expr)): DataFrame = {
      val base = p._1.map(df.filter).getOrElse(df)
      script.output match {
        case TRecord(fs) =>
          val v = colOf(p._2, Map.empty)
          base.select(fs.map(f => v.getField(f.name)
            .cast(outSchema(f.name).dataType).as(f.name)): _*)
        case _ =>
          base.select(colOf(p._2, Map.empty)
            .cast(outSchema.fields(0).dataType).as("out"))
      }
    }
    allPaths.map(project).reduce(_ unionAll _)
  }

  /** Kernel tier: Interp inside a typed flatMap over Rows. */
  def runKernel(script: Script, df: DataFrame,
                libs: Map[String, Values.Value] = Map.empty): DataFrame = {
    val interp = new Interp(script, libs)
    interp.initEnv // force init on the driver (then ships with the closure)
    val inType = script.input
    val outType = script.output
    val outSchema = schemaOf(outType)
    val enc = Encoders.row(outSchema)
    df.flatMap { row =>
      val buf = Vector.newBuilder[Row]
      interp.run(rowToValue(row, inType),
        v => buf += valueToRow(v, outType, outSchema))
      buf.result()
    }(enc)
  }
}
