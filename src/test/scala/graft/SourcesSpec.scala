package graft

import java.nio.file.Files
import graft.ddf.{DDF, DDFContext}

/** reference: bases/data_reader.py / data_saver.py — csv/json/parquet
  * round-trips through the cc.read.* / ddf.save.* surface */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val cc = DDFContext(spark)
  private def tmp(name: String) =
    Files.createTempDirectory(s"graft_$name").toString + "/out"

  private def sample = DDF(Seq((1, "a", 1.5), (2, "b", 2.5), (3, "c", -1.0))
    .toDF("id", "s", "v"))

  test("parquet round-trip") {
    val p = tmp("parquet")
    sample.save.parquet(p)
    val back = cc.read.parquet(p)
    assert(back.toDF.orderBy($"id").collect().toSeq ==
      sample.toDF.orderBy($"id").collect().toSeq)
  }

  test("csv round-trip with header and schema") {
    val p = tmp("csv")
    sample.save.csv(p)
    val back = cc.read.csv(p, header = true,
      schema = Some(sample.schema))
    assert(back.toDF.orderBy($"id").collect().toSeq ==
      sample.toDF.orderBy($"id").collect().toSeq)
    // inferred-schema path
    val inferred = cc.read.csv(p, header = true)
    assert(inferred.countRows() == 3)
  }

  test("json round-trip") {
    val p = tmp("json")
    sample.save.json(p)
    val back = cc.read.json(p, schema = Some(sample.schema))
    assert(back.toDF.orderBy($"id").collect().toSeq ==
      sample.toDF.orderBy($"id").collect().toSeq)
  }

  test("parallelize splits into requested fragments") {
    val rows = (1 to 10).map(i => org.apache.spark.sql.Row(i))
    val d = cc.parallelize(rows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.IntegerType))), nfrag = 4)
    assert(d.numOfPartitions() == 4 && d.countRows() == 10)
  }
}
