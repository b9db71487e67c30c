package graft.sql

import graft.core.Bytes
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the route guard's histogram rank
  * arithmetic (pure JVM, no Spark): `rangeMassBounds` must BRACKET the
  * true number of keys inside an arbitrary union of key ranges, for
  * EXACT boundaries (err = 0 — the full-key-set regime) built by the
  * same rank formula `keyHistogram` uses. Soundness here is what makes
  * a histogram VOUCH safe: an upper bound below the true count would
  * route an anti-selective probe with zero measurement. Duplicated
  * keys, duplicate boundaries, unbounded/empty/overlapping ranges and
  * tiny key sets are all in the generator's range. */
object GuardBoundsProps extends Properties("GuardBounds") {

  private val genKey: Gen[Array[Byte]] =
    Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 3)).map(_.map(_.toByte).toArray))

  private val genKeys: Gen[List[Array[Byte]]] =
    Gen.chooseNum(1, 300).flatMap(n => Gen.listOfN(n, genKey))

  private val genBound: Gen[Option[Array[Byte]]] =
    Gen.option(genKey)

  private val genRanges
      : Gen[List[(Option[Array[Byte]], Option[Array[Byte]])]] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.zip(genBound, genBound)))

  /** Exact equi-depth boundaries by keyHistogram's formula. */
  private def boundaries(sorted: Array[Array[Byte]],
      buckets: Int): Seq[Array[Byte]] = {
    val m = sorted.length
    (0 to buckets).map(j =>
      sorted(math.min(m - 1, (j.toLong * m / buckets).toInt)))
  }

  private def inRange(k: Array[Byte],
      r: (Option[Array[Byte]], Option[Array[Byte]])): Boolean =
    r._1.forall(lo => Bytes.compareTo(k, lo) >= 0) &&
      r._2.forall(hi => Bytes.compareTo(k, hi) < 0)

  property("rangeMassBounds brackets the true in-union count at err=0") =
    forAll(genKeys, genRanges, Gen.chooseNum(1, 16)) { (keys, rs, b) =>
      val sorted = keys.toArray.sortWith(Bytes.compareTo(_, _) < 0)
      val bs = boundaries(sorted, b)
      val truth = keys.count(k => rs.exists(inRange(k, _)))
      val (upper, lower) =
        GraftRouteGuard.rangeMassBounds(bs, rs, 0.0, keys.length.toLong)
      // soundness both ways, with a hair of float tolerance
      lower <= truth + 1e-9 && truth <= upper + 1e-9
    }

  property("err widens the bracket monotonically") =
    forAll(genKeys, genRanges) { (keys, rs) =>
      val sorted = keys.toArray.sortWith(Bytes.compareTo(_, _) < 0)
      val bs = boundaries(sorted, 8)
      val n = keys.length.toLong
      val (u0, l0) = GraftRouteGuard.rangeMassBounds(bs, rs, 0.0, n)
      val (u1, l1) = GraftRouteGuard.rangeMassBounds(bs, rs, 0.01, n)
      u1 >= u0 - 1e-9 && l1 <= l0 + 1e-9
    }
}
