package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for URL-level dedup (DRIVER-EXT, SURVEY.md
  * §2.12) — the first dedup pass of every web-derived corpus pipeline
  * (fetch logs and re-crawls store the same page under trivially
  * different URLs).
  *
  * Pure codegen'd column math — regexp extraction plus array HOFs, no
  * UDF — and every regex is in the Java ∩ RE2 dialect so the DuckDB
  * oracle replays the chain verbatim (same contract as the PII
  * redaction rules, TextFunctions.scala).
  */
object UrlFunctions {

  /** one pass splits the URL; RE2-safe (no backrefs/lookarounds) */
  private val urlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  /** tracking params dropped during canonicalization — the public
    * client-side-only set (they never change served content) */
  private val trackingParamRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid)="

  /** Canonical form for dedup, applying the standard public recipe:
    * lowercase scheme and host; strip a leading `www.`; strip the
    * scheme's default port (`:80` http, `:443` https); drop the
    * fragment; drop tracking query params ([[trackingParamRe]]); sort
    * the surviving query params bytewise; strip trailing slashes from
    * the path. A value that does not look like a URL (no `scheme://`)
    * passes through trimmed, so the function is safe on mixed columns.
    *
    * Deliberately NOT done (each would merge distinct resources):
    * percent-decoding, param-value normalization, host IDN mapping. */
  def normalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, urlRe, 1))
    val hostNoWww = regexp_replace(lower(regexp_extract(u, urlRe, 2)),
      "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(hostNoWww, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostNoWww, ":80$", ""))
      .otherwise(hostNoWww)
    val path = regexp_replace(regexp_extract(u, urlRe, 3), "/+$", "")
    val params = array_join(array_sort(filter(
      split(regexp_extract(u, urlRe, 4), "&"),
      p => length(p) > 0 && !p.rlike(trackingParamRe))), "&")
    when(scheme === "", u).otherwise(concat(
      scheme, lit("://"), host, path,
      when(length(params) > 0, concat(lit("?"), params)).otherwise(lit(""))))
  }

  /** Host of a URL, normalized like [[normalizeUrl]] (lowercase, no
    * `www.` prefix, no port) — the key for domain-level filtering and
    * per-site statistics. Empty string when the value has no
    * `scheme://`. */
  def host(url: Column): Column = {
    val h = regexp_replace(lower(regexp_extract(trim(url), urlRe, 2)),
      "^www\\.", "")
    regexp_replace(h, ":[0-9]+$", "")
  }
}
