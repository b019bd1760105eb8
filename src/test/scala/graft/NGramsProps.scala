package graft

import graft.functions.NGramsGen
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property checks of the native n-gram Generator. The expression
  * evaluates with Literal children and no Spark session, so these run
  * in milliseconds and pin the window math the SQL-surface spec
  * (ExtensionsSpec) spot-checks. */
class NGramsProps extends AnyFunSuite {

  private val anyText: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaChar, Gen.numChar, Gen.oneOf(' ', '\t', '\n', '.', ',', '!'),
    Gen.oneOf('é', 'ã', 'ß', 'ç', 'Ü'), Gen.asciiPrintableChar
  )).map(_.mkString)

  private def samples(g: Gen[String], n: Int = 300): Seq[String] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def run(text: String, k: Int): Seq[String] =
    NGramsGen(Literal(UTF8String.fromString(text), StringType),
        Literal(k, IntegerType))
      .eval(InternalRow.empty).iterator
      .map(_.getString(0)).toSeq

  private def toks(text: String): Seq[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .split("[^\\p{L}\\p{N}]+").toSeq.filter(_.nonEmpty)

  test("ngram count is max(0, tokens - k + 1) for k in 1..4") {
    samples(anyText).foreach { t =>
      val n = toks(t).length
      (1 to 4).foreach { k =>
        assert(run(t, k).size == math.max(0, n - k + 1),
          s"k=$k input: ${t.take(60)}")
      }
    }
  }

  test("each ngram is the exact k-token sliding window, in order") {
    samples(anyText).foreach { t =>
      val ts = toks(t)
      (1 to 3).foreach { k =>
        val expect = ts.sliding(k).filter(_.size == k)
          .map(_.mkString(" ")).toSeq
        assert(run(t, k) == expect, s"k=$k input: ${t.take(60)}")
      }
    }
  }

  test("degenerate sizes and null text yield no rows") {
    assert(run("a b c", 0).isEmpty)
    assert(run("a b c", -1).isEmpty)
    assert(NGramsGen(Literal(null, StringType), Literal(2, IntegerType))
      .eval(InternalRow.empty).iterator.isEmpty)
  }
}
