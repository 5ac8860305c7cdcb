package graft.storage

import org.scalatest.funsuite.AnyFunSuite

/** Gorilla block codec: bit-exact round trips across stream shapes,
  * real compression on steady streams, and the rejection/fuzz laws. */
class GorillaSpec extends AnyFunSuite {

  private def roundtrip(ts: Array[Long], vs: Array[Double]): Unit = {
    val z = Gorilla.compress(ts, vs)
    val (t2, v2) = Gorilla.decompress(z).get
    assert(t2.sameElements(ts))
    assert(v2.length == vs.length)
    for (i <- vs.indices)
      assert(java.lang.Double.doubleToLongBits(v2(i)) ==
        java.lang.Double.doubleToLongBits(vs(i)), s"value $i")
  }

  test("round trips: steady scrape, jitter, irregular, empty, single") {
    roundtrip(Array.emptyByteArray.map(_.toLong), Array.empty[Double])
    roundtrip(Array(12345678900L), Array(3.25))
    val steady = Array.tabulate(5000)(i => 1700000000000000L + i * 15000000L)
    roundtrip(steady, Array.fill(5000)(72.5))
    val jitter = Array.tabulate(3000)(i => 1700000000000000L +
      i * 15000000L + ((i * 2654435761L >>> 20) % 2001) - 1000)
    val vals = Array.tabulate(3000)(i => 70.0 + (i % 7) * 0.25 +
      (if (i % 13 == 0) 1e6 else 0) * (if (i % 2 == 0) 1 else -1))
    roundtrip(jitter, vals)
    // nanosecond-scale irregular gaps exercise the 64-bit escape class
    val wild = Array.tabulate(500)(i => i.toLong * (1L << (i % 40)) + i)
      .scanLeft(0L)(_ + _).tail.sorted
    roundtrip(wild, Array.tabulate(500)(i =>
      java.lang.Double.longBitsToDouble(i.toLong * 2654435761L)))
  }

  test("negative and special values survive bit-exactly") {
    val ts = Array.tabulate(64)(i => 1000L + i * 10)
    val vs = Array.tabulate(64) {
      case 0 => 0.0
      case 1 => -0.0
      case 2 => Double.MaxValue
      case 3 => Double.MinPositiveValue
      case 4 => Double.NaN
      case i => math.pow(-1, i) * i * 0.1
    }
    val (_, v2) = Gorilla.decompress(Gorilla.compress(ts, vs)).get
    for (i <- vs.indices)
      assert(java.lang.Double.doubleToLongBits(v2(i)) ==
        java.lang.Double.doubleToLongBits(vs(i)), s"i=$i")
  }

  test("steady scrape compresses hard (the paper's whole point)") {
    val n = 10000
    val ts = Array.tabulate(n)(i => 1700000000000000L + i * 15000000L)
    val vs = Array.fill(n)(250.0)
    val z = Gorilla.compress(ts, vs)
    // dod=0 + value-repeat = 2 bits/point after the header
    assert(z.length < 20 + n / 3, s"got ${z.length} bytes for $n points")
  }

  test("class arithmetic matches dodClass") {
    assert(Gorilla.dodClass(0) == 0)
    assert(Gorilla.dodClass(64) == 1 && Gorilla.dodClass(-63) == 1)
    assert(Gorilla.dodClass(65) == 2 && Gorilla.dodClass(-64) == 2)
    assert(Gorilla.dodClass(256) == 2 && Gorilla.dodClass(-255) == 2)
    assert(Gorilla.dodClass(257) == 3 && Gorilla.dodClass(-256) == 3)
    assert(Gorilla.dodClass(2048) == 3 && Gorilla.dodClass(-2047) == 3)
    assert(Gorilla.dodClass(2049) == 4 && Gorilla.dodClass(-2048) == 4)
  }

  test("violations reject honestly; fuzz never crashes") {
    val ts = Array.tabulate(300)(i => 1000L + i * 1000 + i % 3)
    val vs = Array.tabulate(300)(i => 10.0 + (i % 5))
    val z = Gorilla.compress(ts, vs)
    assert(Gorilla.decompress(Array.emptyByteArray).isEmpty)
    assert(Gorilla.decompress(z.take(z.length / 2)).isEmpty)
    assert(Gorilla.decompress(z :+ 1.toByte).isEmpty)
    var seed = 87L
    for (_ <- 1 to 400) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val m = z.clone()
      val at = ((seed >>> 16) % m.length).toInt.abs
      m(at) = (m(at) ^ (1 << ((seed >>> 8) & 7)).toInt).toByte
      Gorilla.decompress(m) // must not throw
    }
  }
}
