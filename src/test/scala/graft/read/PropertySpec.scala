package graft.read

import graft.SparkSpec
import graft.core.{Cell, CellKind}
import graft.write.{Compact, Mutations}
import scala.util.Random

/** Randomized invariants over a small, collision-rich keyspace — the
  * property-test tier SURVEY §5 calls for (the reference's
  * `TestAcidGuarantees` analog for our batch model). Seeds are fixed so
  * failures reproduce. */
class PropertySpec extends SparkSpec {

  private def randomCells(seed: Long, n: Int): Seq[Cell] = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val row = s"r${rnd.nextInt(4)}".getBytes("UTF-8")
      val fam = if (rnd.nextBoolean()) "f" else "g"
      val qual = s"q${rnd.nextInt(3)}".getBytes("UTF-8")
      val ts = 1L + rnd.nextInt(6)
      rnd.nextInt(10) match {
        case 0 => Cell.delete(row, fam, qual, ts, seq = i)
        case 1 => Cell.deleteColumn(row, fam, qual, ts, seq = i)
        case 2 => Cell.deleteFamily(row, fam, ts, seq = i)
        case _ => Cell.put(row, fam, qual, ts, s"v$i".getBytes("UTF-8"), seq = i)
      }
    }
  }

  private val seeds = Seq(1L, 7L, 42L, 1234L)

  test("resolve is idempotent on random tombstone-rich batches") {
    for (seed <- seeds) {
      val df = cells(randomCells(seed, 60)).toDF()
      val once = Resolve(df, ReadView(maxVersions = 3))
      assert(collectCells(Resolve(once, ReadView(maxVersions = 3))) ==
        collectCells(once), s"seed=$seed")
    }
  }

  test("merge is order-independent under resolve") {
    for (seed <- seeds) {
      val a = cells(randomCells(seed, 40)).toDF()
      val b = cells(randomCells(seed + 1000, 40)).toDF()
      assert(collectCells(Resolve(Mutations.merge(a, b), ReadView(2))) ==
        collectCells(Resolve(Mutations.merge(b, a), ReadView(2))), s"seed=$seed")
    }
  }

  test("major compaction preserves reads at its maxVersions bound") {
    for (seed <- seeds) {
      val df = cells(randomCells(seed, 60)).toDF()
      val compacted = Compact.major(df, maxVersions = 2)
      assert(collectCells(Resolve(compacted, ReadView(2))) ==
        collectCells(Resolve(df, ReadView(2))), s"seed=$seed")
      // and physically: nothing but puts survives
      assert(compacted.filter(org.apache.spark.sql.functions.col("kind")
        =!= CellKind.Put).isEmpty, s"seed=$seed")
    }
  }

  test("asOf at max timestamp equals an unbounded read") {
    for (seed <- seeds) {
      val df = cells(randomCells(seed, 50)).toDF()
      assert(collectCells(Resolve(df, ReadView(3, asOf = Some(Long.MaxValue)))) ==
        collectCells(Resolve(df, ReadView(3))), s"seed=$seed")
    }
  }
}
