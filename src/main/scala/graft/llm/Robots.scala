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
    // "is this run addressed to *" is a per-(domain, run) window flag, not
    // a join: the old shape branched `lines` into a distinct star-run
    // relation and joined it back, which re-executed the whole
    // explode+regex subtree a second time (the dominant cost of this
    // parse) and paid a join exchange. The flag window partitions by
    // (domain, _run) — hash(domain) already satisfies that clustering and
    // _run is monotone in pos within a domain, so it plans as a local
    // sort over the existing window exchange, never a new one.
    val starRun = max(when(col("_isUa") && col("_ua") === "*", 1)
        .otherwise(0))
      .over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("domain"), col("_run")))
    lines
      .withColumn("_star", starRun)
      .withColumn("_dir",
        lower(trim(regexp_extract(col("line"), "(?i)^\\s*(allow|disallow)\\s*:.*$", 1))))
      .withColumn("prefix",
        trim(regexp_extract(col("line"), "(?i)^\\s*(?:allow|disallow)\\s*:(.*)$", 1)))
      .where(col("_star") === 1 &&
        col("_dir").isin("allow", "disallow") && col("prefix") =!= "")
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
    // ONE pass over the URL relation (the old shape scanned it twice:
    // once into the matched-rule aggregate, once to join the verdict
    // back): left-join each URL row to its matching rules (prefix match
    // in the join condition — the per-site rule relation is small next to
    // a URL corpus, so the planner/AQE picks a broadcast when it fits and
    // a keyed shuffle when the site count outgrows one), then reduce to
    // the per-row verdict with a keyed argmax. longest-match is an
    // argmax, not a ranking: max(struct(len, allow)) picks the longest
    // prefix with allow winning ties — exactly the RFC 9309 (length
    // DESC, allow DESC) first row — and the aggregate partial-aggregates
    // map-side where a window would pay a full sort. The row key `_rid`
    // keeps duplicate URL rows distinct (multiset in, multiset out) and
    // is the ONLY grouping key: the input columns are constant per _rid,
    // so they ride the aggregate as first() values — the exchange hashes
    // an 8-byte key instead of every payload column, and non-groupable
    // column types (maps) pass through unharmed.
    val inCols = urls.columns.toSeq
    val aggs = inCols.map(c => first(col(c)).as(c)) :+
      max(struct(length(col("prefix")).as("_len"), col("allow"))).as("_m")
    keyed.withColumn("_rid", monotonically_increasing_id())
      .join(rules.withColumnRenamed("domain", "_dom2"),
        col("_dom") === col("_dom2") && col("_path").startsWith(col("prefix")),
        "left")
      .groupBy(col("_rid"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("allowed",
        coalesce(col("_m").getField("allow"), lit(true)))
      .select(inCols.map(col) :+ col("allowed"): _*)
  }
}
