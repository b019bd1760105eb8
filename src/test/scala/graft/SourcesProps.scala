package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SeqBucket, SeqScan, SeqSource}

/** Property coverage for the storage-partitioned split planner: the
  * KeyGroupedPartitioning contract is only as good as the splits —
  * a gap loses rows, an overlap duplicates them, a key/range mismatch
  * mis-clusters a join silently. No Spark session needed. */
class SourcesProps extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 300): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val cases: Gen[(Long, Long, Long)] = for {
    lo <- Gen.chooseNum(0L, 10000L)
    len <- Gen.chooseNum(0L, 10000L)
    pstep <- Gen.chooseNum(1L, 1000L)
  } yield (lo, len, pstep)

  private def buckets(lo: Long, hi: Long, pstep: Long): Seq[SeqBucket] =
    new SeqScan(lo, hi, parts = 4, SeqSource.schemaFor(pstep),
      batchRows = 30000L, pstep = pstep)
      .planInputPartitions().toSeq.map(_.asInstanceOf[SeqBucket])

  test("bucket splits partition the surviving range exactly, keyed by id/pstep") {
    samples(cases).foreach { case (lo, len, pstep) =>
      val hi = lo + len
      val bs = buckets(lo, hi, pstep)
      assert(bs.forall(b => b.hi > b.lo))
      if (len == 0) assert(bs.isEmpty)
      else {
        assert(bs.head.lo == lo && bs.last.hi == hi)
        bs.sliding(2).foreach {
          case Seq(a, b) => assert(a.hi == b.lo, s"gap/overlap at $a|$b")
          case _ => ()
        }
        // every id in a split maps to the split's declared key (one
        // split per key — the grouped-layout promise), keys strictly
        // increasing, and the HasPartitionKey row agrees
        bs.foreach { b =>
          assert(b.lo / pstep == b.key && (b.hi - 1) / pstep == b.key,
            s"split [${b.lo}, ${b.hi}) spans multiple keys")
          assert(b.partitionKey().getLong(0) == b.key)
        }
        assert(bs.map(_.key) == bs.map(_.key).sorted.distinct)
      }
    }
  }

  private val rangeCases: Gen[(Long, Long, Int)] = for {
    lo <- Gen.chooseNum(0L, 100000L)
    len <- Gen.chooseNum(0L, 100000L)
    parts <- Gen.chooseNum(1, 64)
  } yield (lo, len, parts)

  test("range splits cover [lo, hi) with at most `parts` pieces") {
    samples(rangeCases).foreach { case (lo, len, parts) =>
      val hi = lo + len
      val rs = SeqScan.splitRange(lo, hi, parts)
        .toSeq.map(_.asInstanceOf[graft.sources.SeqRange])
      assert(rs.length <= parts)
      if (len == 0) assert(rs.isEmpty)
      else {
        assert(rs.head.lo == lo && rs.last.hi == hi)
        rs.sliding(2).foreach {
          case Seq(a, b) => assert(a.hi == b.lo)
          case _ => ()
        }
        assert(rs.map(r => r.hi - r.lo).sum == len)
      }
    }
  }
}
