package graft.tools

import graft._
import org.apache.spark.sql.functions._
object BenchDecode {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    import spark.implicits._
    val ct =
      """{"eventVersion":"1.05","eventTime":"2016-11-14T17:25:45Z","eventName":"CreateUser","eventSource":"iam.amazonaws.com","awsRegion":"us-east-1","sourceIPAddress":"192.0.2.1","userIdentity":{"type":"IAMUser","principalId":"AIDA1234","arn":"arn:aws:iam::123:user/Alice","accountId":"123","userName":"Alice"},"requestParameters":{"userName":"Bob"}}"""
    val cs =
      """{"message_type":"certificate_update","data":{"update_type":"X509LogEntry","leaf_cert":{"subject":{"CN":"example.com"},"all_domains":["example.com","www.example.com"]},"cert_index":12345,"seen":1479144345.0}}"""
    val rows = (1 to 200000).map(i => if (i % 3 == 0) cs else if (i % 7 == 0) "junk " + i else ct)
    val df = rows.toDF("value").repartition(8).cache()
    df.count()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val reg = graft.model.EventSchemas.registry
    for (_ <- 1 to 2) {
      time("dispatch     ") {
        graft.decode.Decode.dispatch(df, reg).select("_event_type").write.mode("overwrite").format("noop").save()
      }
      time("dispatchFast ") {
        graft.decode.Decode.dispatchFast(df, reg).select("_event_type").write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
