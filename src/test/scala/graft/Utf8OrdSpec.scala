package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.table.Utf8Ord

/** Property tests: Utf8Ord (the one ordering the stats-pruning stack
  * compares in) must agree EXACTLY with Spark's own UTF8String binary
  * comparison — that is the ordering min/max aggregates and scan-side
  * residual filters use, so any divergence reopens the non-BMP
  * false-prune hole. Seeded sampling (deterministic), same style as
  * CurvesSpec — the scalacheck bridge isn't in the offline cache. */
class Utf8OrdSpec extends AnyFunSuite {

  private def randomString(rng: scala.util.Random): String = {
    val n = rng.nextInt(8)
    val sb = new StringBuilder
    (0 until n).foreach { _ =>
      rng.nextInt(5) match {
        case 0 => sb.append(('a' + rng.nextInt(26)).toChar) // ASCII
        case 1 => sb.append((0x80 + rng.nextInt(0x700)).toChar) // 2-byte UTF-8
        case 2 => sb.append((0xE000 + rng.nextInt(0x1FFF)).toChar) // 3-byte, high BMP
        case 3 => // supplementary plane (surrogate pair, 4-byte UTF-8)
          sb.appendAll(Character.toChars(0x10000 + rng.nextInt(0xFFFF)))
        case 4 => sb.append('￾') // the boundary the bug lived at
      }
    }
    sb.toString
  }

  test("Utf8Ord agrees with Spark's UTF8String binary comparison on all of Unicode") {
    val rng = new scala.util.Random(77)
    (0 until 20000).foreach { _ =>
      val a = randomString(rng)
      val b = randomString(rng)
      val ours = Integer.signum(Utf8Ord.cmp(a, b))
      val sparks = Integer.signum(
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
      assert(ours == sparks, s"'$a' vs '$b': utf8ord=$ours spark=$sparks")
    }
  }

  test("total order properties: reflexive, antisymmetric, transitive on a sorted sample") {
    val rng = new scala.util.Random(78)
    val xs = (0 until 200).map(_ => randomString(rng)).distinct
    xs.foreach(x => assert(Utf8Ord.cmp(x, x) == 0))
    val sorted = xs.sortWith((a, b) => Utf8Ord.cmp(a, b) < 0)
    sorted.sliding(2).foreach {
      case Seq(a, b) =>
        assert(Utf8Ord.leq(a, b) && Utf8Ord.geq(b, a))
        assert(Integer.signum(Utf8Ord.cmp(a, b)) == -Integer.signum(Utf8Ord.cmp(b, a)))
      case _ => ()
    }
    // ... and it is exactly the byte-array order (sanity vs a reference impl).
    val byBytes = xs.sortBy(_.getBytes("UTF-8").toSeq.map(b => b & 0xff))(
      Ordering.Implicits.seqOrdering[Seq, Int])
    assert(sorted == byBytes)
  }
}
