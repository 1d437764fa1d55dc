package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.UrlFunctions

/** Domain-blocklist filtering (DRIVER-EXT, SURVEY.md §2.12) — the
  * URL-level hygiene pass of a web-corpus pipeline: drop every
  * document whose host is a blocked domain OR any subdomain of one
  * (`ads.example.com` is blocked by `example.com`).
  *
  * Shape at 100 TB: the blocklist (thousands to low millions of
  * rows — public lists are MBs) BROADCASTS; the corpus never
  * shuffles. The match condition is equality-or-dot-suffix, so the
  * join is a broadcast non-equi semi join — linear in corpus size,
  * blocklist scanned per row from memory. For blocklists too big to
  * broadcast, pre-explode the corpus host into its suffix chain and
  * equi-join instead (not needed at public-list sizes).
  */
object DomainFilter {

  /** rows of `df` whose `urlCol` host matches no blocked domain.
    * `blocked` holds bare domains (`example.com`), matched
    * case-insensitively against the normalized host. */
  def dropBlockedDomains(df: DataFrame, urlCol: String,
                         blocked: DataFrame,
                         blockedCol: String = "domain"): DataFrame = {
    val b = broadcast(
      blocked.select(lower(trim(col(blockedCol))).as("__blocked")))
    val withHost = df.withColumn("__host",
      UrlFunctions.host(col(urlCol)))
    withHost.join(b,
        col("__host") === col("__blocked") ||
          col("__host").endsWith(concat(lit("."), col("__blocked"))),
        "left_anti")
      .drop("__host")
  }
}
