package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt policy evaluation — the fetch-permission gate in front of
  * every crawl stage (a curation pipeline that re-fetches or audits pages
  * must answer "may the generic crawler touch this URL?" per the de-facto
  * REP standard, RFC 9309): parse each site's robots.txt into prefix
  * rules for the `*` agent, then decide every URL by the LONGEST matching
  * prefix, allow winning ties, no match meaning allowed.
  *
  * Both halves are pure columnar plans. Parsing is line-explode +
  * window arithmetic (group runs of consecutive `User-agent` lines; a
  * rule line belongs to the nearest preceding run); deciding is one
  * keyed join on the registrable domain plus a per-URL rank window —
  * at 100 TB of URLs the shuffle carries (domain, path-prefix) rules of
  * a few hundred bytes per site, never page content.
  */
object Robots {

  /** Parse `(domainCol, textCol)` robots.txt bodies into the `*`-agent
    * rule relation `(domain, prefix, allow)`. REP group semantics: a
    * group is a RUN of consecutive `User-agent:` lines followed by its
    * rule lines; a group applies to `*` iff any of its agent lines is
    * `*`. Empty-path `Disallow:` lines (the "allow everything" idiom)
    * contribute no rule. Comments (`# …`) and unknown directives are
    * ignored — the tolerant-reader posture real robots files require.
    */
  def parseRobots(df: DataFrame, domainCol: String = "domain",
                  textCol: String = "robots"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(domainCol).orderBy("pos")
    val lines = df
      .select(col(domainCol).as("domain"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("line", regexp_replace(col("line"), "#.*$", ""))
      .withColumn("_ua",
        when(lower(col("line")).rlike("^\\s*user-agent\\s*:"),
          trim(regexp_extract(col("line"), "(?i)^\\s*user-agent\\s*:(.*)$", 1))))
      .withColumn("_isUa", col("_ua").isNotNull)
      .withColumn("_newRun",
        (col("_isUa") && !coalesce(lag("_isUa", 1).over(w), lit(false)))
          .cast("int"))
      .withColumn("_run", sum("_newRun").over(
        org.apache.spark.sql.expressions.Window.partitionBy(domainCol)
          .orderBy("pos")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
    val starRuns = lines.where(col("_isUa") && col("_ua") === "*")
      .select(col("domain"), col("_run")).distinct()
    lines
      .withColumn("_dir",
        lower(trim(regexp_extract(col("line"), "(?i)^\\s*(allow|disallow)\\s*:.*$", 1))))
      .withColumn("prefix",
        trim(regexp_extract(col("line"), "(?i)^\\s*(?:allow|disallow)\\s*:(.*)$", 1)))
      .where(col("_dir").isin("allow", "disallow") && col("prefix") =!= "")
      .join(starRuns, Seq("domain", "_run"))
      .select(col("domain"), col("prefix"),
        (col("_dir") === "allow").as("allow"))
  }

  /** Decide fetchability for every row of `urls`: join the URL's
    * registrable domain to its rules, keep rules whose prefix matches the
    * URL path, rank by (prefix length DESC, allow DESC) — the RFC 9309
    * longest-match rule with allow winning ties — and default to allowed
    * when nothing matches (no rules, no robots, unparseable URL). Adds an
    * `allowed` boolean; input columns pass through.
    */
  def decide(urls: DataFrame, rules: DataFrame,
             urlCol: String = "url"): DataFrame = {
    val path0 = regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1)
    val keyed = urls.withColumn("_dom", Urls.registrableDomain(col(urlCol)))
      .withColumn("_path", when(path0 === "", lit("/")).otherwise(path0))
    val matched = keyed.join(rules.withColumnRenamed("domain", "_dom"), "_dom")
      .where(col("_path").startsWith(col("prefix")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_dom", "_path")
      .orderBy(length(col("prefix")).desc, col("allow").desc)
    val best = matched
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .select(col("_dom"), col("_path"), col("allow").as("_best"))
      .distinct()
    keyed.join(best, Seq("_dom", "_path"), "left")
      .withColumn("allowed", coalesce(col("_best"), lit(true)))
      .drop("_dom", "_path", "_best")
  }
}
