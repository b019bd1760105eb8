package graft

import graft.operators.SqlSurface
import org.apache.spark.sql.functions._

/** Spark 4 SQL-surface rungs: SQL UDF / SQL table function (bodies
  * inline into the plan — no closure lane), pipe syntax (sugar for
  * the same plan), and collations (case-insensitivity as a type
  * property). Each is pinned against an independent equivalent. */
class SqlSurfaceSpec extends SparkSpec {

  test("sql_udf: nested SQL UDFs inline — no closure UDF in the plan") {
    val df = SqlSurface.sqlUdf(spark, sfDir)
    val rows = df.collect()
    // the function body became expression tree, not a black-box UDF
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"SQL UDF left a closure node:\n$plan")
    // equal to the hand-inlined DataFrame twin
    val netC = expr("CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)")
    val twin = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(netC).as("net_cents"),
        sum(expr("CAST(round(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) * (1 + l_tax)) AS BIGINT)")).as("taxed_cents"))
      .orderBy("l_returnflag")
    assert(rows.toSeq == twin.collect().toSeq)
  }

  test("sql_tvf: the table function is the parameterized subquery") {
    val out = SqlSurface.sqlTvf(spark, sfDir).head()
    val exp = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .agg(count(lit(1)),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")),
        countDistinct("o_custkey")).head()
    assert(out == exp)
  }

  test("sql_pipe lowers to the same answer as the nested form") {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    val piped = SqlSurface.sqlPipe(spark, sfDir).collect()
    val nested = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n_items,
        |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |    AS BIGINT)) AS sum_cents
        |FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY 1, 2 HAVING count(*) > 100
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect()
    assert(piped.toSeq == nested.toSeq)
  }

  test("sql_scripting: the WHILE/IF script equals its one-aggregate fold") {
    val row = SqlSurface.sqlScripting(spark, sfDir).head()
    val folded = Tables.orders(spark, sfDir)
      .agg(sum(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")))
      .head().getLong(0)
    assert(row.getLong(0) == folded)
    assert(row.getString(1) == (if (folded % 2 == 0) "even" else "odd"))
  }

  test("sql_variables: EXECUTE IMMEDIATE binds the LIVE variable value") {
    val auto = SqlSurface.sqlVariables(spark, sfDir).head()
    assert(auto.getString(0) == "AUTOMOBILE")
    // rebind and re-execute the same dynamic SQL: the binding must
    // track the variable, not a captured value
    spark.sql("SET VAR graft_seg = 'BUILDING'")
    val building = spark.sql(
      """EXECUTE IMMEDIATE
        |  'SELECT c_mktsegment AS seg, count(*) AS n FROM
        |   IDENTIFIER(graft_tab) WHERE c_mktsegment = ?
        |   GROUP BY c_mktsegment'
        |USING graft_seg""".stripMargin).head()
    assert(building.getString(0) == "BUILDING")
    val exp = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING").count()
    assert(building.getLong(1) == exp)
  }

  test("sql_params: named parameters bind as literals, equal inlined twin") {
    val got = SqlSurface.sqlParams(spark, sfDir).collect()
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    val inlined = spark.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |FROM orders
        |WHERE o_orderdate >= DATE '1995-01-01'
        |  AND o_orderdate < DATE '1997-01-01'
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    assert(got.toSeq == inlined.collect().toSeq)
    // the markers are real bindings: different args, different rows
    val other = spark.sql(
      "SELECT count(*) AS n FROM orders WHERE o_orderpriority = :p",
      Map("p" -> "5-LOW")).head().getLong(0)
    val low = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "5-LOW").count()
    assert(other == low)
  }

  test("collation_ops: UTF8_LCASE distinct/equality vs independent recount") {
    import spark.implicits._
    val row = SqlSurface.collationOps(spark, sfDir).head()
    val toks = Tables.documents(spark, sfDir)
      .select(explode(expr("regexp_extract_all(text, '[A-Za-z]+', 0)")).as("t"))
      .as[String].collect()
    assert(row.getLong(0) == toks.map(_.toLowerCase).distinct.length.toLong)
    assert(row.getLong(1) == toks.distinct.length.toLong)
    assert(row.getLong(2) == toks.count(_.toLowerCase == "the").toLong)
    // crafted mixed-case corpus: the collation must actually merge
    // case variants (the sf0.001 corpus happens to be case-collision
    // free, which would prove nothing)
    Seq("Foo foo FOO bar", "The THE the bar Bar")
      .toDF("text").createOrReplaceTempView("documents")
    val crafted = SqlSurface.collationBody(spark).head()
    assert(crafted.getLong(0) == 3L, "ci distinct: foo, bar, the")
    assert(crafted.getLong(1) == 8L, "cs distinct keeps every variant")
    assert(crafted.getLong(2) == 3L, "The/THE/the all equal 'the' under UTF8_LCASE")
  }
}
