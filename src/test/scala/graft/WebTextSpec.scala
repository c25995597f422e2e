package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.WebText

class WebTextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("t").select(WebText.stripHtml(col("t"))).as[String].head()

  private def parts(s: String): (String, String, String) =
    Seq(s).toDF("u")
      .select(WebText.urlParts(col("u")).as("p"))
      .select(col("p.url_norm"), col("p.host"), col("p.domain"))
      .as[(String, String, String)].head()

  test("stripHtml removes script/style bodies, comments, tags; keeps text") {
    val html = "<html><head><title>T</title>" +
      "<style type=\"text/css\">body { color: #fff; }</style>" +
      "<script>if (a < b && c > d) { alert(\"x\"); }</script></head>" +
      "<!-- secret <b>comment</b>\nspanning lines --><body>" +
      "<h1 class=\"t\">Head</h1><p>one</p><p>two</p></body></html>"
    // adjacent block boundaries (</p><p>) read as a paragraph break
    assert(strip(html) === "T\n\nHead\n\none\n\ntwo")
  }

  test("stripHtml decodes entities with &amp; last (no double decode)") {
    assert(strip("<p>M&amp;A &lt;tag&gt; &quot;q&quot; &#39;s &amp;lt; x</p>")
      === "M&A <tag> \"q\" 's &lt; x")
    assert(strip("a&nbsp;&nbsp;b &mdash; c&hellip;") === "a b — c…")
  }

  test("stripHtml whitespace: horizontal runs collapse, spaces hug " +
    "newlines away, 3+ newlines clamp to 2, result trimmed") {
    assert(strip("  a\t\tb  <br>  <br>\n<br>c  ") === "a b\n\nc")
  }

  test("stripHtml of null and plain text is safe / identity-ish") {
    val r = Seq[(Integer, String)]((1, null)).toDF("i", "t")
      .select(WebText.stripHtml(col("t"))).as[String].head()
    assert(r === "")
    assert(strip("plain text, no markup.") === "plain text, no markup.")
  }

  test("urlParts lowercases scheme+host, strips fragment, default ports, " +
    "www and tracking params; keeps other params and path case") {
    val (n, h, d) = parts(
      "HTTPS://WWW.Example.CO.uk:443/Path/X?utm_source=tw&id=9&gclid=z#frag")
    assert(n === "https://www.example.co.uk/Path/X?id=9")
    assert(h === "www.example.co.uk")
    assert(d === "example.co.uk")
  }

  test("urlParts keeps non-default ports; empty path becomes /; plain " +
    "2-label domains extract from deep subdomains") {
    val (n, h, d) = parts("http://a.b.sample.com:8080")
    assert(n === "http://a.b.sample.com:8080/")
    assert(h === "a.b.sample.com")
    assert(d === "sample.com")
    val (n2, _, _) = parts("http://x.org:80/p?utm_a=1")
    assert(n2 === "http://x.org/p")
  }

  test("urlParts: tracking-only query vanishes entirely; leading tracker " +
    "with survivors repairs the separator") {
    assert(parts("https://e.com/p?utm_source=a&utm_medium=b")._1
      === "https://e.com/p")
    assert(parts("https://e.com/p?utm_source=a&keep=1&fbclid=z&k2=2")._1
      === "https://e.com/p?keep=1&k2=2")
  }

  test("urlParts passes non-URL input through untouched") {
    val (n, h, d) = parts("not a url at all")
    assert(n === "not a url at all" && h === "" && d === "")
  }

  test("htmlSignals: ppm ratios, tag and anchor counts on a known doc") {
    val html = "<html><body><p>twelve chars</p>" +
      "<a href=\"/x\">nav</a><a href=\"/y\">more nav</a></body></html>"
    val (tr, ld, nt, nl) = Seq(html).toDF("t")
      .select(graft.ops.WebText.htmlSignals(col("t")).as("s"))
      .select(col("s.text_ratio_ppm"), col("s.link_density_ppm"),
        col("s.n_tags"), col("s.n_links"))
      .as[(Long, Long, Long, Long)].head()
    val total = html.length.toLong
    // extracted text = "twelve chars\nnav more nav" (block break after p)
    assert(tr === 25L * 1000000L / total)
    val linkChars = "<a href=\"/x\">nav</a>".length +
      "<a href=\"/y\">more nav</a>".length
    assert(ld === linkChars * 1000000L / total)
    assert(nt === 10L)
    assert(nl === 2L)
  }

  test("urlParts single-label host falls back to itself as domain") {
    val (_, h, d) = parts("http://localhost:9000/x")
    assert(h === "localhost" && d === "localhost")
  }
}
