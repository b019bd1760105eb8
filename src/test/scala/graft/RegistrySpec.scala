package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract's registry invariants — a mistyped key or a
  * query registered without its oracle would otherwise surface only
  * in the driver's correctness gate, as a silent MISSING/weaker
  * rows-only entry. No Spark session needed. */
class RegistrySpec extends AnyFunSuite {

  test("every registered query has an oracle and every oracle a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty,
      s"oracles without a query (typo?): ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty,
      s"queries without an oracle — every operator here is meant to " +
        s"be DuckDB-gated: ${(q -- o).toSeq.sorted}")
  }

  test("module maps never shadow each other's keys") {
    // ++ silently keeps the right-hand entry on collision; a reused
    // name would quietly replace an operator in the driver contract
    val maps: Seq[(String, Set[String])] = Seq(
      "TextOps" -> graft.operators.TextOps.queries.keySet,
      "RelOps" -> graft.operators.RelOps.queries.keySet,
      "TpchOps" -> graft.operators.TpchOps.queries.keySet,
      "MapReduce" -> graft.operators.MapReduce.queries.keySet,
      "TextAnalysis" -> graft.operators.TextAnalysis.queries.keySet,
      "Dedup" -> graft.operators.Dedup.queries.keySet,
      "Similarity" -> graft.operators.Similarity.queries.keySet,
      "Multimodal" -> graft.operators.Multimodal.queries.keySet,
      "SqlSurface" -> graft.operators.SqlSurface.queries.keySet,
      "FuncOps" -> graft.operators.FuncOps.queries.keySet,
      "JoinOps" -> graft.operators.JoinOps.queries.keySet,
      "PipelineOps" -> graft.operators.PipelineOps.queries.keySet,
      "ChangeOps" -> graft.operators.ChangeOps.queries.keySet,
      "SaltedAgg" -> graft.operators.SaltedAgg.queries.keySet,
      "StreamOps" -> graft.streaming.StreamOps.queries.keySet,
      "StorageOps" -> graft.sources.StorageOps.queries.keySet,
      "AvroIO" -> graft.sources.AvroIO.queries.keySet,
      "TopKOps" -> graft.operators.TopKOps.queries.keySet,
      "Retrieval" -> graft.operators.Retrieval.queries.keySet,
      "Governance" -> graft.operators.Governance.queries.keySet)
    val collisions = maps.combinations(2).flatMap {
      case Seq((an, as), (bn, bs)) =>
        (as & bs).map(k => s"$k ($an vs $bn)")
    }.toSeq
    assert(collisions.isEmpty, s"shadowed query keys: $collisions")
    assert(maps.map(_._2.size).sum == SparkEntry.queries.size)
  }
}
