package graft.core

import org.scalacheck.{Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the byte codec layer (pure JVM, no Spark):
  * the ordering contract in SURVEY §7.5 risk 1 — big-endian encodings of
  * non-negative integers must order like the numbers under the
  * unsigned-lexicographic comparator, which BytesSpec separately proves
  * agrees with Spark's BinaryType ordering. */
object BytesProps extends Properties("Bytes") {

  property("long round-trip") = forAll { (v: Long) =>
    Bytes.toLong(Bytes.toBytes(v)) == v
  }

  property("int round-trip") = forAll { (v: Int) =>
    Bytes.toInt(Bytes.toBytes(v)) == v
  }

  property("double round-trip preserves bits") = forAll { (v: Double) =>
    java.lang.Double.doubleToLongBits(Bytes.toDouble(Bytes.toBytes(v))) ==
      java.lang.Double.doubleToLongBits(v)
  }

  property("string round-trip") = forAll { (s: String) =>
    Bytes.toString(Bytes.toBytes(s)) == s
  }

  property("non-negative long encoding is order-preserving") =
    forAll { (a0: Long, b0: Long) =>
      val a = a0 & Long.MaxValue
      val b = b0 & Long.MaxValue
      math.signum(Bytes.compareTo(Bytes.toBytes(a), Bytes.toBytes(b)).toLong) ==
        math.signum(java.lang.Long.compare(a, b).toLong)
    }

  property("compareTo is a total order consistent with equality") =
    forAll { (a: Array[Byte], b: Array[Byte]) =>
      val ab = Bytes.compareTo(a, b)
      val ba = Bytes.compareTo(b, a)
      (math.signum(ab) == -math.signum(ba)) &&
        ((ab == 0) == a.sameElements(b))
    }

  property("prefixSuccessor bounds exactly the prefix range") =
    forAll { (p0: Array[Byte], ext: Array[Byte]) =>
      val p = p0.take(8)
      Bytes.prefixSuccessor(p) match {
        case None => Prop.passed // all-0xff prefix: unbounded above
        case Some(succ) =>
          val extended = p ++ ext
          // everything with the prefix sorts before the successor...
          Prop(Bytes.compareTo(extended, succ) < 0) :| "prefixed < succ" &&
            // ...and the successor sorts after the bare prefix
            Prop(Bytes.compareTo(p, succ) < 0) :| "prefix < succ"
      }
    }
}
