package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the first transform a web-crawl corpus runs
  * (before ANY text stage: language-ID, quality, dedup all assume markup
  * is gone). A pure columnar regex rule chain (no UDF, no parser library),
  * which is exactly the trafilatura/jusText preprocessing tier a 100 TB
  * pipeline wants riding the scan as one shuffle-free projection:
  *   1. drop `<script>`/`<style>` ELEMENTS wholesale (their content is
  *      code, not text — and may contain `<` that would derail naive tag
  *      stripping),
  *   2. drop comments,
  *   3. replace every remaining tag with a space (block/inline distinction
  *      collapses under rule 5),
  *   4. decode the common entities — `&amp;` LAST, so `&amp;lt;` decodes
  *      to the literal `&lt;` and not `<` (the double-decode bug),
  *   5. collapse whitespace runs and trim.
  * This is deliberately an extraction BASELINE (DOM-free): main-content
  * scoring needs a tree; the rule chain is the tier every pipeline runs
  * even when a DOM pass follows.
  */
object Html {

  /** The document title (entity-decoded), '' when no `<title>`. */
  def title(html: Column): Column =
    decodeEntities(regexp_extract(html, "(?is)<title[^>]*>([^<]*)</title>", 1))

  /** Visible text under rules 1-5. */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    trim(regexp_replace(decodeEntities(noTags), "\\s+", " "))
  }

  /** All `<a href="...">` targets in document order — the crawl-frontier /
    * link-graph extraction tier (anchors feed PageRank and frontier
    * scheduling). One codegen'd regexp pass riding the scan; quoted hrefs
    * only, matching the extraction-baseline posture of [[extractText]].
    */
  def links(html: Column): Column =
    regexp_extract_all(html,
      lit("(?is)<a\\s(?:[^>]*?\\s)?href=\"([^\"]*)\""), lit(1))

  /** The visible anchor TEXT of every `<a>` element in document order —
    * the companion of [[links]] (anchor text is the classic off-page
    * relevance signal: what OTHER pages call the link target). Simple
    * (non-nested) anchor bodies only, the extraction-baseline posture.
    */
  def anchorTexts(html: Column): Column =
    regexp_extract_all(html,
      lit("(?is)<a\\s[^>]*>([^<]*)</a>"), lit(1))

  /** `(href, term)` pairs extracted in ONE regex pass per anchor ELEMENT —
    * aligned by construction. Zipping [[links]] with [[anchorTexts]] is
    * wrong on mixed markup: the two regexes match DIFFERENT anchor sets
    * (href-less or single-quoted anchors appear in one but not the other),
    * so the arrays silently misalign. Here each matched element yields its
    * own pair; anchors without a double-quoted href surface as href = ''
    * (callers filter), never as a shifted pairing.
    */
  def anchorPairs(html: Column): Column = {
    val elems = regexp_extract_all(html,
      lit("(?is)<a\\s[^>]*>[^<]*</a>"), lit(0))
    transform(elems, e => struct(
      regexp_extract(e, "(?is)\\shref=\"([^\"]*)\"", 1).as("href"),
      regexp_extract(e, "(?is)>([^<]*)</a>", 1).as("term")))
  }

  private def decodeEntities(c: Column): Column = {
    val base = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ")
    val decoded = base.foldLeft(c) { case (acc, (e, v)) =>
      regexp_replace(acc, e, v)
    }
    regexp_replace(decoded, "&amp;", "&") // last — see rule 4
  }
}
