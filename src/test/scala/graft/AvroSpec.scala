package graft

import org.apache.spark.sql.functions.col

/** The avro-mapred-backed Avro source/sink ([[graft.sources.AvroIO]]):
  * row-level value survival (the oracle gates only aggregates), write
  * parallelism, and reader-schema evolution semantics. */
class AvroSpec extends SparkSpec {

  test("avro roundtrip: every row survives bit-exact, one container " +
    "file per write partition") {
    val dir = Scratch.processScoped("graft_avro_spec", "li").toString
    graft.sources.AvroIO.writeAvro(spark, sfDir, dir)
    val back = graft.sources.AvroIO.readAvro(spark, dir)
    val src = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
    // multiset equality, both directions (exceptAll is bag semantics)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).count() == 0, "avro read invented rows")
    assert(src.exceptAll(back).count() == 0, "avro read lost rows")
    // the write is one container file per partition — the
    // embarrassingly-parallel sink shape (no single-writer funnel)
    val files = Option(new java.io.File(dir).listFiles()).fold(0)(
      _.count(_.getName.endsWith(".avro")))
    assert(files == src.rdd.getNumPartitions,
      s"$files container files for ${src.rdd.getNumPartitions} partitions")
  }

  test("avro evolution: reader default fills every legacy row, row " +
    "mass survives the dropped column") {
    val out = graft.sources.AvroIO.avroEvolution(spark, sfDir).collect()
    val n = Tables.lineitem(spark, sfDir).count()
    assert(out.map(_.getLong(1)).sum == n, "row mass changed under evolution")
    out.foreach { r =>
      assert(r.getLong(2) == 7L && r.getLong(3) == 7L,
        s"reader default not applied: $r")
    }
  }
}
