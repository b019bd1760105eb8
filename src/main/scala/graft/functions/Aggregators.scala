package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF surface (SURVEY.md §2.3: the reference's black-box
  * reducer contract as a Spark `Aggregator`). Aggregators run with
  * partial (map-side) aggregation — the buffer merges associatively —
  * so they hold the 100 TB contract that `groupReduce`'s
  * all-values-iterator cannot.
  */
object Aggregators {

  /** MinHash signature as a single-pass Aggregator: buffer = the
    * per-seed minima; merge = element-wise min. Hash-identical to the
    * 64×min() expression form (Dedup.minhashSignatures): seed i's hash
    * is exactly `xxhash64(lit(i), shingle)` — XxHash64 folds child
    * hashes left-to-right from seed 42, so hashInt(i, 42) feeds
    * hashUTF8String — which lets the registered LSH path run through
    * this UDAF and produce the same signatures as the expression form
    * (equivalence asserted in FunctionsSpec).
    */
  class MinHashAgg(numHashes: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String

    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

    override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
      val u = UTF8String.fromString(shingle) // one conversion, 64 hashes
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashUTF8String(u, XXH64.hashInt(i, 42L))
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** MinHash signature over PRE-HASHED shingles via the classic
    * universal family h_i(g) = (a_i·g + b_i) mod p (Carter–Wegman),
    * p = 2³¹−1. Unlike [[MinHashAgg]] (whose xxhash64 family is
    * Spark-specific), every operation here — the md5-prefix base hash
    * computed upstream and this integer arithmetic — is replicable
    * verbatim in any SQL engine, which is what lets the registered
    * LSH/dedup queries carry a real DuckDB oracle instead of a
    * rows-only check. Same partial/merge contract: buffer = per-seed
    * minima, merged element-wise map-side. Hash-identical to the
    * 64×min() expression form (asserted in FunctionsSpec). */
  class MinHashArithAgg(a: Array[Long], b: Array[Long], p: Long)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    private val n = a.length

    override def zero: Array[Long] = Array.fill(n)(Long.MaxValue)

    override def reduce(buf: Array[Long], gh: Long): Array[Long] = {
      val g = gh % p
      var i = 0
      while (i < n) {
        val v = (a(i) * g + b(i)) % p
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < n) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
      x
    }

    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Numerically stable streaming mean+variance (Welford/Chan
    * parallel merge) — the canonical "can't do this with a black-box
    * iterator at scale" aggregate. */
  case class MomentsBuf(n: Long, mean: Double, m2: Double)

  class WelfordAgg extends Aggregator[Double, MomentsBuf, (Double, Double)] {
    override def zero: MomentsBuf = MomentsBuf(0L, 0.0, 0.0)
    override def reduce(b: MomentsBuf, x: Double): MomentsBuf = {
      val n = b.n + 1
      val d = x - b.mean
      val mean = b.mean + d / n
      MomentsBuf(n, mean, b.m2 + d * (x - mean))
    }
    override def merge(a: MomentsBuf, b: MomentsBuf): MomentsBuf = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        MomentsBuf(n, a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    }
    override def finish(r: MomentsBuf): (Double, Double) =
      (r.mean, if (r.n > 1) r.m2 / (r.n - 1) else 0.0)
    override def bufferEncoder: Encoder[MomentsBuf] = Encoders.product
    override def outputEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  }

  /** Misra–Gries heavy-hitters summary with k counters as a mergeable
    * Aggregator: after any partition split and merge order, every item
    * with true frequency > n/k is present in the summary and its
    * estimate undercounts by at most n/k (Misra–Gries 1982; merge
    * procedure and bound from Agarwal et al., "Mergeable Summaries",
    * PODS 2012: sum counters, subtract the k-th largest, keep
    * positives). The ESTIMATES depend on partition/merge order — only
    * the guarantee is partition-independent, so queries must emit the
    * bracket (found + within n/k), never the raw estimate. Buffer is a
    * bounded immutable map (≤ k−1 entries, the summary invariant);
    * per-row cost is O(1) amortized for resident tokens, O(k) on
    * overflow decrements — at 100 TB this is the point: the full token
    * stream folds into a k-entry buffer per task with no shuffle wider
    * than k rows per partition. */
  class MisraGriesAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
      b.get(w) match {
        case Some(c) => b.updated(w, c + 1)
        case None if b.size < k - 1 => b.updated(w, 1L)
        case None =>
          b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }

    override def merge(a: Map[String, Long],
                       b: Map[String, Long]): Map[String, Long] = {
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val sum = (a.keySet ++ b.keySet).iterator
          .map(w => w -> (a.getOrElse(w, 0L) + b.getOrElse(w, 0L))).toMap
        if (sum.size <= k - 1) sum
        else {
          val kth = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)
            .apply(k - 1)
          sum.view.mapValues(_ - kth).filter(_._2 > 0).toMap
        }
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Count-min sketch (Cormode/Muthukrishnan 2005) as a mergeable
    * counter matrix: buffer = flattened d×w Long counters, reduce
    * increments one counter per hash row, merge = element-wise add —
    * EXACT and commutative, so unlike Misra-Gries the final matrix is
    * fully partition-layout-independent and the point estimates are
    * deterministic for fixed data. The input row carries the d bucket
    * indices PRE-COMPUTED with the SQL `hash(word, i)` expression, so
    * the probe side can replay the identical hashes in-plan (no UDF
    * and no driver-side sketch lookup — `element_at` on the finished
    * array column answers point queries inside codegen). At 100 TB
    * the full token stream folds into one d×w matrix per task and a
    * single d×w-row merge — no shuffle wider than the matrix, and
    * matrices from different corpora/days add associatively (the
    * warehouse lands per-partition sketches and unions them on read,
    * the same lifecycle as the HLL rung). */
  class CmsAgg(d: Int, w: Int)
      extends Aggregator[Seq[Int], Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.fill(d * w)(0L)
    override def reduce(buf: Array[Long], idx: Seq[Int]): Array[Long] = {
      var i = 0
      while (i < d) { buf(i * w + idx(i)) += 1L; i += 1 }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }
}
