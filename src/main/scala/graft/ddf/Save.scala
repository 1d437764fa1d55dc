package graft.ddf

import org.apache.spark.sql.DataFrame

/** reference: ddf_library/bases/data_saver.py — `ddf.save.*`. The
  * reference writes one file per fragment; Spark writes one file per
  * partition of the final stage, same contract.
  */
class Save(df: DataFrame) {
  private def w(mode: String) = df.write.mode(mode)
  def csv(path: String, mode: String = "overwrite",
          header: Boolean = true): Unit =
    w(mode).option("header", header).csv(path)
  def json(path: String, mode: String = "overwrite"): Unit =
    w(mode).json(path)
  def parquet(path: String, mode: String = "overwrite"): Unit =
    w(mode).parquet(path)
}
