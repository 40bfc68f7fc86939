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

  /** Multi-label public suffixes recognized by [[registrableDomain]] — a
    * representative "public-suffix-lite" subset of the PSL's most common
    * country-code second-level registries. The real PSL is thousands of
    * rules and changes monthly; a production curator ships the full list
    * through the same rule (the membership test is a broadcast-friendly
    * literal IN — swap the Seq, nothing else moves).
    */
  val multiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in", "co.kr", "or.kr",
    "com.mx", "com.ar", "com.tw", "com.sg", "com.hk",
    "co.za", "co.nz", "com.tr")

  /** Lowercased host of an absolute URL (userinfo and port stripped), or
    * NULL when the string has no scheme://authority shape — the same
    * never-manufacture-a-URL stance as [[canonicalize]].
    */
  def host(u: Column): Column = {
    val auth = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val h = regexp_replace(regexp_replace(auth, "^[^@]*@", ""), ":[0-9]+$", "")
    when(h === "", lit(null).cast("string")).otherwise(h)
  }

  /** Registrable domain (eTLD+1) of a URL — the per-SITE key a crawl
    * curator groups by (domain quotas, per-site stats, robots buckets):
    * the last two host labels, or the last three when the two-label tail
    * is a recognized multi-part public suffix ([[multiPartSuffixes]] —
    * `blog.example.co.uk` keys as `example.co.uk`, not `co.uk`). IPv4
    * literals key as themselves; hosts with one label (intranet names)
    * too; non-URLs are NULL. Pure columnar split/element_at chain — rides
    * the scan like every rule here.
    */
  def registrableDomain(u: Column): Column = {
    val h = host(u)
    val labels = split(h, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(h.isNull, lit(null).cast("string"))
      .when(h.rlike("^[0-9]+(\\.[0-9]+){3}$"), h)
      .when(n <= 2, h)
      .when(last2.isin(multiPartSuffixes: _*), last3)
      .otherwise(last2)
  }

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
