package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-crawl curation primitive in front of
  * every dedup stage: a crawl sees the same page under scheme/host case
  * variants, default ports, `www.` aliases, duplicated or trailing
  * slashes, shuffled query parameters, tracking parameters, and fragments;
  * canonicalizing FIRST turns byte-level URL noise into exact keys, so
  * URL dedup becomes a plain keyed aggregate (the [[Dedup.exact]] posture:
  * the canonical string is the shuffle key, one map + one exchange at any
  * corpus size).
  *
  * The rule set (each a pure columnar regex/array expression — the whole
  * chain rides the scan, no UDF):
  *   1. lowercase scheme and host,
  *   2. strip default ports (`:80` http, `:443` https),
  *   3. strip a leading `www.`,
  *   4. collapse duplicate path slashes, strip a trailing slash (root
  *      stays `/`; an empty path becomes `/`),
  *   5. drop tracking parameters (`utm_*`, `fbclid`, `gclid`, `ref`),
  *   6. sort surviving query parameters bytewise,
  *   7. drop the fragment.
  * Path case is preserved (paths are case-significant by RFC 3986; hosts
  * are not).
  */
object Urls {

  /** Tracking-parameter names dropped by rule 5 (the regex alternation is
    * shared with the oracle).
    */
  val trackingParamRe = "^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$"

  def canonicalize(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    when(scheme === "", u).otherwise(canonicalizeParsed(u, scheme))
  }

  /** The rule chain for a string that DID parse a scheme; anything else
    * (relative links, data:, garbage) passes through unchanged — a
    * canonicalizer must never manufacture a URL out of a non-URL.
    */
  private def canonicalizeParsed(u: Column, scheme: Column): Column = {
    val rest = regexp_replace(
      regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", ""), "#.*$", "")
    val authority = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val host0 = regexp_replace(authority, ":[0-9]+$", "")
    val host = regexp_replace(host0, "^www\\.", "")
    val port = regexp_extract(authority, ":([0-9]+)$", 1)
    val portSuffix = when(port === "", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val rawPath = regexp_extract(pathq, "^([^?]*)", 1)
    val collapsed = regexp_replace(rawPath, "/{2,}", "/")
    val path = when(collapsed === "" || collapsed === "/", lit("/"))
      .otherwise(regexp_replace(collapsed, "/$", ""))
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = array_join(
      array_sort(filter(split(query, "&"),
        p => p =!= "" && !p.rlike(trackingParamRe))), "&")
    concat(scheme, lit("://"), host, portSuffix, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }
}
