package graft.sources

import org.scalacheck.{Gen, Prop, Test => SchkTest}
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import scala.collection.immutable.ListMap

/** Property-based roundtrip for the clean-room msgpack codec: for
  * arbitrary nested values, readValue(writeValue(v)) must equal the
  * canonical decode shape (ints widen to Long, arrays to Vector, maps to
  * ordered Vector[(String, Any)], doubles bit-exact incl. NaN). */
class MsgpackPropertySpec extends AnyFunSuite {

  private val genLeaf: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    Gen.oneOf(true, false),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(identity[Long]),
    Gen.chooseNum(-128, 127).map(_.toByte),
    Gen.chooseNum(-32768, 32767).map(_.toShort),
    Gen.chooseNum(Int.MinValue, Int.MaxValue).map(identity[Int]),
    Gen.oneOf(
      Gen.chooseNum(-1e12, 1e12),
      Gen.oneOf[Double](0.0, -0.0, Double.NaN, Double.PositiveInfinity,
        Double.MinPositiveValue)),
    Gen.alphaNumStr.map(_.take(40)),
    Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
      .map(_.toArray))

  private def genValue(depth: Int): Gen[Any] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      4 -> genLeaf,
      1 -> Gen.listOfN(3, genValue(depth - 1)).map(_.toVector),
      1 -> (for {
        ks <- Gen.listOfN(3, Gen.identifier.map(_.take(10)))
        vs <- Gen.listOfN(3, genValue(depth - 1))
      } yield ListMap(ks.distinct.zip(vs): _*)))

  /** Expected decode shape of a generated value. */
  private def canon(v: Any): Any = v match {
    case b: Byte  => b.toLong
    case s: Short => s.toLong
    case i: Int   => i.toLong
    case xs: Vector[_] => xs.map(canon)
    case m: ListMap[_, _] =>
      m.toVector.map { case (k, x) => (String.valueOf(k), canon(x)) }
    case other => other
  }

  private def deepEq(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Double, y: Double) =>
      java.lang.Double.doubleToLongBits(x) ==
        java.lang.Double.doubleToLongBits(y)
    case (x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
    case (x: Vector[_], y: Vector[_]) =>
      x.size == y.size && x.zip(y).forall { case (p, q) => deepEq(p, q) }
    case ((k1: String, v1), (k2: String, v2)) => k1 == k2 && deepEq(v1, v2)
    case (x, y) => x == y
  }

  test("writeValue/readValue roundtrip arbitrary nested values") {
    val prop = Prop.forAll(genValue(3)) { v =>
      val o = new ByteArrayOutputStream()
      Msgpack.writeValue(o, v)
      val back = Msgpack.readValue(ByteBuffer.wrap(o.toByteArray))
      deepEq(back, canon(v))
    }
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("every integer width picks a decodable encoding") {
    val interesting = Seq(0L, 1L, -1L, 31L, 32L, 127L, 128L, 255L, 256L,
      -32L, -33L, -128L, -129L, 32767L, 32768L, 65535L, 65536L,
      Int.MaxValue.toLong, Int.MaxValue + 1L, 4294967295L, 4294967296L,
      Long.MaxValue, Long.MinValue, -32768L, -32769L,
      Int.MinValue.toLong, Int.MinValue - 1L)
    interesting.foreach { i =>
      val o = new ByteArrayOutputStream()
      Msgpack.writeValue(o, i)
      assert(Msgpack.readValue(ByteBuffer.wrap(o.toByteArray)) == i, s"$i")
    }
  }
}
