package graft

import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Cross-operator invariants on the real testdata (SURVEY.md §5.2):
  * relations that must hold between independent operators regardless
  * of data, so a bug in either side breaks an equation rather than
  * shifting both answers in lockstep. */
class InvariantSpec extends SparkSpec {

  test("inverted index row sums equal the word counts") {
    import spark.implicits._
    val byWord = TextOps.invertedIndex(spark, sfDir)
      .groupBy("word").agg(sum("cnt").as("total"))
      .as[(String, Long)].collect().toMap
    val wc = TextOps.wordcount(spark, sfDir)
      .as[(String, Long)].collect().toMap
    assert(byWord == wc)
  }

  test("exact dedup is idempotent and conserves documents") {
    val first = Dedup.dedupExact(spark, sfDir)
    val nDocs = Tables.documents(spark, sfDir).count()
    // survivors' multiplicities account for every document
    val copies = first.agg(sum("n_copies")).head().getLong(0)
    assert(copies == nDocs)
    // survivors are distinct by content → deduping them again is a no-op
    val survivorIds = first.select(col("keep_id").as("doc_id"))
    val survivors = Tables.documents(spark, sfDir).join(survivorIds, "doc_id")
    val again = survivors
      .select(col("doc_id"),
        sha2(regexp_replace(trim(lower(col("text"))), "\\s+", " "), 256).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("n"))
    assert(again.filter(col("n") > 1).count() == 0)
    assert(again.count() == first.count())
  }

  test("tf-idf joins back to exactly the wordcount vocabulary per doc") {
    val tfidf = graft.operators.TextAnalysis.tfidf(spark, sfDir)
    // every (doc, word) in tfidf must exist in the inverted index
    val idx = TextOps.invertedIndex(spark, sfDir)
      .select(col("word"), col("doc_id"))
    val orphans = tfidf.select("word", "doc_id").except(idx)
    assert(orphans.count() == 0)
  }
}
