package graft.lang

import graft.SparkSpec

/** F10: parametric type declarations + generic application (the
  * TypeCons/TypeFunc surface of ast.rs:203-205 — HKTs stay out of scope,
  * as the reference defers them to 0.2). */
class GenericsSpec extends SparkSpec {
  import spark.implicits._

  test("generic type declarations apply and reach the IO schema") {
    val src = """script "generics";
      |type Pair<T>: (T, T);
      |type Tagged<K, V>: {key: K, val: V};
      |input  Int;
      |output Pair<Int>;
      |func dup(x: Int) -> Pair<Int> { (x, x) }
      |out dup(in);""".stripMargin
    val c = UdScript.compile(src)
    assert(c.outputSchema.fieldNames.toSeq == Seq("_1", "_2"))
    val rows = c.run(Seq(7L).toDF("value")).collect()
    assert(rows(0) == org.apache.spark.sql.Row(7L, 7L))
  }

  test("generic record application substitutes field types") {
    val src = """script "generic record";
      |type Tagged<K, V>: {key: K, val: V};
      |input  {key: Str, val: Int};
      |output Tagged<Str, Int>;
      |out {key: in.key, val: in.val * 2};""".stripMargin
    val c = UdScript.compile(src)
    assert(c.outputSchema.fieldNames.toSeq == Seq("key", "val"))
    val rows = c.run(Seq(("a", 3L)).toDF("key", "val")).collect()
    assert(rows(0) == org.apache.spark.sql.Row("a", 6L))
  }

  test("arity mismatch on a generic type is a compile error") {
    val src = """script "bad arity";
      |type Pair<T>: (T, T);
      |input  Int;
      |output Pair<Int, Str>;
      |out (in, in);""".stripMargin
    val e = intercept[UdScript.CompileError] { UdScript.compile(src) }
    assert(e.msg.contains("expects 1 parameter"))
  }
  test("function type params erase to their bound (manual.md add<T: Int>)") {
    val src = """script "generic add";
      |input  {a: Int, b: Int};
      |output {sum: Int};
      |func add<T: Int>(x: T, y: T) -> T { x + y }
      |out {sum: add(in.a, in.b)};""".stripMargin
    val c = UdScript.compile(src)
    assert(c.tier == UdScript.ColumnTier)
    import spark.implicits._
    val out = c.run(Seq((2L, 40L)).toDF("a", "b")).collect()
    assert(out(0).getLong(0) == 42L)
  }

  test("Number parses as the Int | Float union alias") {
    val src = """script "number";
      |input  {id: Int, v: Number};
      |output {id: Int, shown: Str};
      |out {id: in.id, shown: match (in.v) {
      |  case i: Int => "int";
      |  case f: Float => "float";
      |}};""".stripMargin
    val c = UdScript.compile(src)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Some(5L), None: Option[Double]),
      (2L, None: Option[Long], Some(1.5)))
      .toDF("id", "i", "f")
      .select(col("id"), struct(
        when(col("i").isNotNull, "Int").otherwise("Float").as("_tag"),
        col("i").as("v0"), col("f").as("v1")).as("v"))
    val out = c.run(df).orderBy("id").collect().map(_.getString(1))
    assert(out.toSeq == Seq("int", "float"))
  }

  test("a self-referential generic type errors instead of looping") {
    val src = """script "loop type";
      |type Loop<T>: Loop<T>;
      |input  Loop<Int>;
      |output Int;
      |out 1;""".stripMargin
    val e = intercept[Exception] { UdScript.compile(src) }
    assert(e.getMessage != null)
  }

}
