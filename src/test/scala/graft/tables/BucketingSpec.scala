package graft.tables

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("joining two same-bucketed tables produces no shuffle") {
    val dir = "/root/testdata/sf0.001"
    // force a non-broadcast join so the exchange question is real
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(Tables.load(spark, dir, "lineitem"), "li_bucketed", "l_orderkey", 4)
      Bucketing.writeBucketed(Tables.load(spark, dir, "orders"), "o_bucketed", "o_orderkey", 4)
      val joined = Bucketing.colocatedJoin(spark, "li_bucketed", "o_bucketed", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      plan should not include "Exchange"
      joined.count() shouldBe Tables.load(spark, dir, "lineitem").count()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
