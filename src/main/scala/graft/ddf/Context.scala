package graft.ddf

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** reference: ddf_library/bases/context_base.py :: COMPSsContext +
  * bases/data_reader.py — the `cc.read.*` / `cc.parallelize` entry
  * points. The reference reads file blocks into pandas fragments via
  * PyCOMPSs tasks; here every format goes through Spark's DataSource
  * framework, which owns splits, locality, schema inference, predicate
  * pushdown and partition pruning.
  */
class DDFContext(val spark: SparkSession) {

  /** reference: functions/etl/parallelize.py — local rows → distributed */
  def parallelize(rows: Seq[Row], schema: StructType, nfrag: Int): DDF =
    DDF(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, nfrag), schema))

  def importData(df: DataFrame): DDF = DDF(df)

  object read {
    /** reference: bases/data_reader.py :: csv. `num_of_parts` is
      * unnecessary: the source splits by HDFS/file blocks. */
    def csv(path: String, sep: String = ",", header: Boolean = true,
            schema: Option[StructType] = None): DDF = {
      val r = spark.read.option("sep", sep).option("header", header)
      DDF(schema.fold(r.option("inferSchema", true))(r.schema)
        .csv(path))
    }

    /** reference: bases/data_reader.py :: json (line-delimited) */
    def json(path: String, schema: Option[StructType] = None): DDF =
      DDF(schema.fold(spark.read)(spark.read.schema).json(path))

    /** parquet — primary format for this engine's testdata */
    def parquet(path: String): DDF = DDF(spark.read.parquet(path))

    /** ORC (engine ext): the other columnar format Spark ships a
      * vectorized, pushdown-capable reader for — same predicate
      * pushdown / column pruning / partition pruning behavior as
      * parquet, for interop with Hive-era warehouses. */
    def orc(path: String): DDF = DDF(spark.read.orc(path))

    /** reference: bases/data_reader.py :: pickle. DOCUMENTED
      * DIVERGENCE: the JVM cannot execute Python pickle, so the
      * pickle alias stores/loads the same logical DataFrame as
      * parquet (Save.pickle is the writing half). Files written by
      * the reference's actual pickle writer are NOT readable here —
      * re-export them as parquet/csv from the reference first. */
    def pickle(path: String): DDF = parquet(path)

    /** Raw text source (engine ext): one row per line in a single
      * string column `value` — the ingestion format of
      * one-document-per-line corpora before any schema exists.
      * Splits by file blocks like every file source; pair with
      * `wholetext = true` for one row per FILE (small-file corpora —
      * at scale prefer line-delimited or parquet, a 10 GB file
      * becomes one row). */
    def text(path: String, wholetext: Boolean = false): DDF =
      DDF(spark.read.option("wholetext", wholetext).text(path))

    /** reference: functions/geo/read_shapefile.py — ESRI .shp
      * geometry plus optional .dbf attributes; see
      * [[graft.sources.Shapefile]]. Result feeds Geo.geoWithin. */
    def shapefile(shpPath: String, dbfPath: Option[String] = None): DDF =
      DDF(graft.sources.Shapefile.read(spark, shpPath, dbfPath))

    /** WARC web-archive records (r16, engine ext — see
      * [[graft.sources.Warc]]); `httpBodies = true` unwraps response
      * records' HTTP envelopes into UTF-8 bodies ready for
      * [[DDF.extractMain]]. */
    def warc(path: String, httpBodies: Boolean = false): DDF = {
      val records = graft.sources.Warc.read(spark, path)
      DDF(if (httpBodies) graft.sources.Warc.httpResponses(records)
      else records)
    }
  }
}

object DDFContext {
  def apply(spark: SparkSession): DDFContext = new DDFContext(spark)
}
