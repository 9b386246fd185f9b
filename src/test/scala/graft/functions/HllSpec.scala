package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class HllSpec extends AnyFunSuite {

  private def sketchOf(keys: Iterator[String]): Array[Byte] = {
    val regs = Hll.empty
    keys.foreach(k => Hll.add(regs, Hll.hashString(k)))
    regs
  }

  test("estimate within 3% across four orders of magnitude") {
    for (n <- Seq(100, 1000, 10000, 100000)) {
      val est = Hll.estimate(sketchOf(Iterator.range(0, n).map(i => s"key-$i")))
      assert(math.abs(est - n).toDouble / n <= 0.03,
        s"n=$n est=$est (${math.abs(est - n).toDouble / n})")
    }
  }

  test("duplicates never inflate the estimate") {
    val once = Hll.estimate(sketchOf(Iterator.range(0, 5000).map(i => s"k$i")))
    val thrice = Hll.estimate(sketchOf(
      Iterator.range(0, 15000).map(i => s"k${i % 5000}")))
    assert(once === thrice)
  }

  test("merge equals the sketch of the union") {
    val a = sketchOf(Iterator.range(0, 3000).map(i => s"a$i"))
    val b = sketchOf(Iterator.range(1500, 4500).map(i => s"a$i"))
    val union = sketchOf(Iterator.range(0, 4500).map(i => s"a$i"))
    assert(Hll.merge(a, b).toSeq === union.toSeq)
    // and the merged estimate tracks the true union cardinality
    val est = Hll.estimate(Hll.merge(a, b))
    assert(math.abs(est - 4500).toDouble / 4500 <= 0.03, s"est=$est")
  }

  test("registers are a fixed 4 KiB regardless of cardinality") {
    assert(Hll.empty.length === 4096)
    assert(sketchOf(Iterator.range(0, 200000).map(_.toString)).length === 4096)
  }
}
