package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus text extraction: HTML-to-text stripping and URL
  * normalization / registrable-domain extraction. Both are pure
  * codegen'd string-expression chains — map-only, zero shuffle, no UDFs —
  * because at 100 TB these run inside the very first scan of raw crawl
  * data and must not break whole-stage codegen or force an exchange.
  *
  * The reference corpus boundary (git-metadata-extractor ingests JSON-LD
  * that upstream crawlers already extracted) puts HTML extraction just
  * outside its repo; a training-data pipeline over raw web captures needs
  * it first-class, so it lives here beside the quality/PII/dedup gates
  * (cf. `TextOps`).
  */
object WebText {

  /** HTML entity decode table. Order is load-bearing: `&amp;` (and its
    * numeric form) MUST decode last, so `&amp;lt;` becomes the literal
    * text `&lt;` rather than `<` — the standard single-pass decode rule.
    * Covers the named + numeric entities that dominate real crawl text;
    * general `&#NNNN;` decode is intentionally out of scope (it would
    * need a higher-order `transform`, which leaves whole-stage codegen —
    * the wrong trade for a head-of-scan operator).
    */
  private[graft] val entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&#160;" -> " ",
    "&lt;" -> "<", "&#60;" -> "<",
    "&gt;" -> ">", "&#62;" -> ">",
    "&quot;" -> "\"", "&#34;" -> "\"",
    "&apos;" -> "'", "&#39;" -> "'",
    "&ndash;" -> "–", "&#8211;" -> "–",
    "&mdash;" -> "—", "&#8212;" -> "—",
    "&lsquo;" -> "‘", "&#8216;" -> "‘",
    "&rsquo;" -> "’", "&#8217;" -> "’",
    "&ldquo;" -> "“", "&#8220;" -> "“",
    "&rdquo;" -> "”", "&#8221;" -> "”",
    "&hellip;" -> "…", "&#8230;" -> "…",
    "&amp;" -> "&", "&#38;" -> "&")

  private[graft] val blockTagPattern: String =
    "(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|blockquote|title|" +
      "section|article|header|footer)\\b[^>]*>"

  /** HTML → plain text, the C4/CCNet-style fast path:
    *
    *  1. drop comments (dotall — they span lines) and whole
    *     `<script>`/`<style>` elements including their bodies (a `<` or
    *     `&&` inside JS must not leak into text);
    *  2. block-level tags become newlines (paragraph structure survives
    *     for the downstream line-dedup / quality gates), every remaining
    *     tag becomes a space;
    *  3. decode entities ([[entities]], `&amp;` last);
    *  4. normalize whitespace: horizontal runs → one space, spaces hug
    *     newlines away, 3+ newlines → 2, trim.
    *
    * Every pattern is ASCII-only and chosen for Java-regex / RE2 dialect
    * agreement (the q67 technique), so the q83 oracle replays the exact
    * chain in DuckDB and byte-matches the full extracted text.
    */
  def stripHtml(c: Column): Column = {
    val t0 = coalesce(c, lit(""))
    val noComment = regexp_replace(t0, "(?s)<!--.*?-->", " ")
    val noScript =
      regexp_replace(noComment, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val blocks = regexp_replace(noStyle, blockTagPattern, "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", " ")
    val decoded = entities.foldLeft(noTags) { case (acc, (k, v)) =>
      replace(acc, lit(k), lit(v))
    }
    val ws1 = regexp_replace(decoded, "[ \\t\\x0B\\f\\r]+", " ")
    val ws2 = regexp_replace(ws1, "[ ]*\\n[ ]*", "\n")
    // plain trim strips only spaces — edge newlines must go too
    trim(regexp_replace(ws2, "\\n{3,}", "\n\n"), " \n")
  }

  /** Structural HTML signals for boilerplate/navigation filtering, all
    * map-only: extracted-text-to-markup ratio and link density (chars
    * inside `<a>` elements, tags included) as exact ppm BIGINTs (same
    * floor-parity trick as NgramStats — no round() ties cross-engine),
    * plus tag and anchor counts. High link density + low text ratio is
    * the classic nav/footer page profile (the jusText / boilerpipe
    * heuristic family).
    */
  def htmlSignals(c: Column): Column = {
    val x = coalesce(c, lit(""))
    val total = greatest(length(x), lit(1)).cast("long")
    val textLen = length(stripHtml(x)).cast("long")
    val linkChars = (length(x) -
      length(regexp_replace(x, "(?is)<a\\b[^>]*>.*?</a\\s*>", "")))
      .cast("long")
    def ppm(n: Column) =
      least(floor(n * lit(1000000L) / total), lit(1000000L)).cast("long")
    struct(
      ppm(textLen).as("text_ratio_ppm"),
      ppm(linkChars).as("link_density_ppm"),
      regexp_count(x, lit("<[^>]*>")).cast("long").as("n_tags"),
      regexp_count(x, lit("(?i)<a\\b")).cast("long").as("n_links"))
  }

  /** URL normalization + registrable-domain extraction as one struct
    * `(url_norm, host, domain)`:
    *
    *  - fragment dropped; scheme and host lowercased (path/query case is
    *    significant and preserved);
    *  - scheme-default ports stripped (`:443` on https, `:80` on http),
    *    non-default ports kept;
    *  - tracking query params removed (`utm_*`, `fbclid`, `gclid`) with
    *    separators repaired, other params preserved in order;
    *  - empty path canonicalized to `/`;
    *  - `domain` = registrable domain: leading `www.` stripped, then the
    *    last two labels — or three when the second-level label is a
    *    common country-code second-level (`co|com|net|org|gov|ac|edu`
    *    under a 2-letter ccTLD, e.g. `example.co.uk`). A full public
    *    suffix list is data, not code; this heuristic covers the bulk of
    *    crawl traffic and the cutover is one broadcast-joined table if a
    *    caller ever ships the PSL.
    *
    * Non-URL input (no `scheme://`) passes through untouched in
    * `url_norm` with empty host/domain — a filter predicate upstream, not
    * an error. No casts, so no ANSI hazards on adversarial strings.
    */
  def urlParts(c: Column): Column = {
    val u = coalesce(c, lit(""))
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport =
      lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = regexp_replace(hostport, ":[0-9]+$", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val rest0 = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val rest1 = regexp_replace(rest0, "&(?:utm_[a-zA-Z]+|fbclid|gclid)=[^&]*", "")
    val rest2 =
      regexp_replace(rest1, "\\?(?:utm_[a-zA-Z]+|fbclid|gclid)=[^&]*&", "?")
    val rest3 =
      regexp_replace(rest2, "\\?(?:utm_[a-zA-Z]+|fbclid|gclid)=[^&]*$", "")
    val path = when(rest3 === "", lit("/")).otherwise(rest3)
    val keepPort = when(
      port === "" || (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"),
      lit("")).otherwise(concat(lit(":"), port))
    val hostNoWww = regexp_replace(host, "^www\\.", "")
    val dom3 = regexp_extract(hostNoWww,
      "([^.]+\\.(?:co|com|net|org|gov|ac|edu)\\.[a-z]{2})$", 1)
    val dom2 = regexp_extract(hostNoWww, "([^.]+\\.[^.]+)$", 1)
    val domain =
      when(dom3 =!= "", dom3).when(dom2 =!= "", dom2).otherwise(hostNoWww)
    val urlNorm = when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), host, keepPort, path))
    struct(urlNorm.as("url_norm"), host.as("host"), domain.as("domain"))
  }
}
