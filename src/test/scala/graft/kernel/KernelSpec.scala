package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Kernel/Emitter semantics vs the reference VM (vm.rs:373-405, 583-638),
  * including golden ports of the reference's example corpus (examples dir)
  * (FIXTURES.md §A) run as pure per-record kernels. */
class KernelSpec extends AnyFunSuite {

  private def run[I, O](k: Kernel[I, O], ins: I*): Seq[O] =
    ins.flatMap(i => k(i).toSeq)

  test("out emits in order; zero/one/many per record (flatMap shape)") {
    val k = Kernel[Int, Int] { (n, em) => (1 to n).foreach(em.out) }
    assert(run(k, 0, 1, 3) == Seq(1, 1, 2, 3))
  }

  test("suppose: branch runs with captured outputs when delegate emits") {
    val k = Kernel[Boolean, String] { (b, em) =>
      em.suppose { if (b) { em.out("Yeah! "); em.out("Yeah! ") } } { cap =>
        em.out("She loves you, ")
        em.emitAll(cap)
      } { em.out("Yesterdayyyyyyyy") }
    }
    assert(run(k, true) == Seq("She loves you, ", "Yeah! ", "Yeah! "))
    assert(run(k, false) == Seq("Yesterdayyyyyyyy"))
  }

  test("suppose: emissions inside delegate go to innermost capture only") {
    val k = Kernel[Unit, String] { (_, em) =>
      em.out("before")
      em.suppose {
        em.out("inner")
        em.suppose { /* nothing */ } { cap => em.emitAll(cap) } {
          em.out("leaf-of-nested") // emitted inside OUTER capture
        }
      } { cap => em.out(s"captured:${cap.size}"); em.emitAll(cap) } {
        em.out("never")
      }
      em.out("after")
    }
    assert(run(k, ()) ==
      Seq("before", "captured:2", "inner", "leaf-of-nested", "after"))
  }

  test("UdException aborts the record; runEither routes it") {
    val k = Kernel[Int, String] { (n, em) =>
      em.out(s"pre-$n")
      if (n < 0) throw UdException("negative")
      em.out(s"post-$n")
    }
    // direct apply: exception propagates (abort-on-invalid default)
    intercept[UdException] { k(-1).toSeq }
    // partial emissions before the throw are discarded with the record
    val em = new Emitter[String]
    intercept[UdException] { k.body(-1, em) }
  }

  // ---- golden ports of the reference example corpus (FIXTURES.md §A) ----

  test("hello.us: out 'Hello, ' + in") {
    val k = Kernel[String, String] { (in, em) => em.out("Hello, " + in) }
    assert(run(k, "world") == Seq("Hello, world"))
  }

  test("simple.us / function.us: nested pure functions") {
    def bar(x: Double) = x - 1.0
    def baz(x: Double) = 2.0 * x
    val simple = Kernel[Long, Double] { (in, em) => em.out(baz(bar(in.toDouble))) }
    assert(run(simple, 3L) == Seq(4.0))
    def c2f(c: Double) = 9.0 * c / 5.0 + 32.0
    val function = Kernel[Long, Double] { (in, em) => em.out(c2f(in.toDouble)) }
    assert(run(function, 100L) == Seq(212.0))
  }

  test("fact.us: recursive factorial") {
    def fact(n: Long): Long = if (n <= 1) 1 else n * fact(n - 1)
    val k = Kernel[Long, Long] { (in, em) => em.out(fact(in)) }
    assert(run(k, 5L) == Seq(120L))
  }

  test("count.us: recursive countdown emits n..0") {
    val k = Kernel[Int, Int] { (in, em) =>
      def count(n: Int): Unit = { em.out(n); if (n > 0) count(n - 1) }
      count(in)
    }
    assert(run(k, 3) == Seq(3, 2, 1, 0))
  }

  test("lists.us: init-block list + per-record comprehension emit") {
    val foo = Seq(1, 2, 3, 4, 5)          // init block: let foo = [1..5]
    def square(x: Int) = x * x
    val k = Kernel[Int, Int] { (in, em) => foo.foreach(x => em.out(square(x) + in)) }
    assert(run(k, 10) == Seq(11, 14, 19, 26, 35))
  }

  test("scopes.us: lexical scoping + closures (addn)") {
    val x = 5                              // init: let x = 5
    def addn(n: Int): Int => Int = (y: Int) => y + n
    val add1 = addn(1)
    val k = Kernel[Int, Int] { (_, em) => em.out(add1(6)); em.out(add1(x * 2)) }
    assert(run(k, 0) == Seq(7, 11))       // "should output 7", "Should output 11"
  }
}
