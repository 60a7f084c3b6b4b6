package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-written HTML fixtures for [[Html.extractText]]: nested tags,
  * entity decode order, CDATA, script/style content removal, br
  * variants, case-insensitive tags, whitespace normalization, and the
  * documented pass-through bounds (unknown entities, unclosed `<`). */
class HtmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(html: String): (String, Long, Long) = {
    val r = Html.extractText(Seq((1L, html)).toDF("id", "html"),
      "id", "html").collect()(0)
    (r.getString(1), r.getLong(2), r.getLong(3))
  }

  test("nested tags flatten; block closes become lines") {
    val (t, nl, nc) = extract(
      "<div><p>outer <b>bold <i>deep</i></b> end</p><p>two</p></div>")
    assert(t == "outer bold deep end\ntwo")
    assert(nl == 2L)
    assert(nc == t.length.toLong)
  }

  test("entity decode order: &amp;lt; yields literal &lt;, &amp; last") {
    // decoding &amp; first would turn &amp;lt; into < (double decode)
    val (t, _, _) = extract("<p>&amp;lt; and &lt;tag&gt; and &amp;&#39;q&#39;</p>")
    assert(t == "&lt; and <tag> and &'q'")
  }

  test("decoded &lt;script&gt; text is NOT re-parsed as markup") {
    val (t, _, _) = extract("<p>&lt;script&gt;alert(1)&lt;/script&gt;</p>")
    assert(t == "<script>alert(1)</script>")
  }

  test("script/style/comment/CDATA content is dropped, even with < inside") {
    val (t, _, _) = extract(
      "<head><style>p > a { color: red; }</style>" +
        "<SCRIPT type=\"x\">if (a < b && c > d) { f(); }</SCRIPT>" +
        "<!-- a <p>commented</p> tag --><![CDATA[ raw < bytes ]]></head>" +
        "<p>kept</p>")
    assert(t == "kept")
  }

  test("br variants and case-insensitive block tags segment lines") {
    val (t, nl, _) = extract(
      "<P>one<br>two<BR/>three<br />four</P><H2>head</H2>")
    assert(t == "one\ntwo\nthree\nfour\nhead")
    assert(nl == 5L)
  }

  test("table cells, list items and headings each get their own line") {
    val (t, _, _) = extract(
      "<ul><li>a</li><li>b</li></ul><table><tr><td>c</td><th>d</th></tr></table>")
    assert(t == "a\nb\nc\nd")
  }

  test("whitespace collapses within lines; empty lines drop; edges trim") {
    val (t, nl, _) = extract(
      "<p>  spaced \t out  </p><p></p><p>\r\n</p><div>  x  </div>")
    assert(t == "spaced out\nx")
    assert(nl == 2L)
  }

  test("documented bounds: unknown NAMED entities and unclosed < pass through") {
    // &copy; is in the HTML4 table (decodes); &copyz; / &foo; are not
    val (t1, _, _) = extract("<p>&copy; and &#169; decode, &copyz; &foo; stay</p>")
    assert(t1 == "© and © decode, &copyz; &foo; stay")
    // an unclosed < has no closing >: left in place, not guessed at
    val (t2, _, _) = extract("<p>a < b stays</p>")
    assert(t2 == "a < b stays")
  }

  test("full HTML4 named table: 252 case-sensitive entries, crawl-common refs decode") {
    import graft.functions.TextKernels
    assert(TextKernels.htmlEntityTable.size == 252)
    // the three DTD groups land intact: Latin-1 96 (160..255), the
    // rest split symbol/special
    assert(TextKernels.htmlEntityTable.values.count(
      cp => cp >= 160 && cp <= 255) == 96)
    val (t, _, _) = extract(
      "<p>it&rsquo;s &mdash; wait&hellip; caf&eacute; &ndash; &ldquo;q&rdquo;" +
        " &copy;&reg;&trade; &euro;100 &Eacute;tat &alpha;&beta; x&ne;y</p>")
    assert(t == "it’s — wait… café – “q” ©®™ €100 État αβ x≠y")
    // nbsp canonicalizes to plain space; ensp/emsp/thinsp decode to
    // their REAL codepoints (the quirk is NBSP-only)
    val (t2, _, _) = extract("<p>a&nbsp;b&ensp;c&emsp;d&thinsp;e</p>")
    assert(t2 == "a b c d e")
  }

  test("named refs: case sensitivity, missing semicolon, and no rescan") {
    // &ampx (no semicolon) stays verbatim; &amp;x decodes to &x
    val (t1, _, _) = extract("<p>&ampx vs &amp;x</p>")
    assert(t1 == "&ampx vs &x")
    // wrong case is not a name (the table is case-sensitive; Eacute
    // and eacute are DISTINCT valid entries)
    val (t2, _, _) = extract("<p>&RSQUO; stays, &Eacute; decodes</p>")
    assert(t2 == "&RSQUO; stays, É decodes")
    // no rescan: &amp;mdash; yields the literal &mdash; (a sequential
    // replace chain would double-decode)
    val (t3, _, _) = extract("<p>&amp;mdash; and &#38;hellip;</p>")
    assert(t3 == "&mdash; and &hellip;")
    // 8 is the longest name: a 9-alnum run never matches
    val (t4, _, _) = extract("<p>&thetasym; ok, &thetasymX; no</p>")
    assert(t4 == "ϑ ok, &thetasymX; no")
  }

  test("hex refs accept ASCII hex digits only (no Unicode digit classes)") {
    // U+0663 ARABIC-INDIC THREE: Character.digit calls it 3, the HTML
    // ASCII-hex rule does not — the ref must stay verbatim
    val (t, _, _) = extract("<p>bad&#x٣٦; good&#x41;</p>")
    assert(t == "bad&#x٣٦; goodA")
  }

  test("numeric refs: decimal, hex (either case), leading zeros, " +
      "supplementary plane; NBSP forms become plain space") {
    val (t, _, _) = extract(
      "<p>caf&#233; &#x2019;q&#X2019; A&#0065; emo&#128512; grin&#x1F600;</p>")
    assert(t == "café ’q’ AA emo😀 grin😀")
    // numeric 160 and hex a0 take the same plain-space canonicalization
    // as &nbsp; (the whitespace squeeze must see them)
    val (t2, _, _) = extract("<p>a&#160;b&#xa0;c&nbsp; d</p>")
    assert(t2 == "a b c d")
  }

  test("numeric refs: malformed, truncated, out-of-range, surrogate and " +
      "control refs pass through VERBATIM") {
    val (t, _, _) = extract(
      "<p>&#; &#z; &#xD800; &#1114112; &#x110000; &#7; trunc&#39 tail&#</p>")
    assert(t == "&#; &#z; &#xD800; &#1114112; &#x110000; &#7; trunc&#39 tail&#")
    // digit-count caps: 8 decimal digits / 7 hex digits are malformed
    // even when the value would be small
    val (t2, _, _) = extract("<p>&#00000065; &#x0000041;</p>")
    assert(t2 == "&#00000065; &#x0000041;")
  }

  test("single-pass decode: &#38;lt; and &#38;amp; do not re-decode") {
    // a sequential replace chain would turn &#38;lt; into < (double
    // decode); the one-pass kernel yields the literals a real parser does
    val (t, _, _) = extract("<p>&#38;lt; and &#38;amp; and &#38;#39;</p>")
    assert(t == "&lt; and &amp; and &#39;")
  }

  test("br branch is word-anchored: <brand> strips without a line break") {
    val (t, nl, _) = extract(
      "<p>a<brand x>mid</brand>b<br>c<br/>d<br />e<br clear=all>f</p>")
    assert(t == "amidb\nc\nd\ne\nf")
    assert(nl == 5L)
  }

  test("empty input and tag-only input yield empty text with 0 lines") {
    val (t, nl, nc) = extract("<html><body><div></div></body></html>")
    assert(t == "" && nl == 0L && nc == 0L)
  }

  private def md(s: String): String =
    Html.markdownText(Seq((1L, s)).toDF("id", "md"), "id", "md")
      .collect()(0).getString(1)

  test("markdown: fenced code dropped, inline code text kept") {
    assert(md("before\n```\nval x = 1\n```\nafter `span` end") ==
      "before\nafter span end")
  }

  test("markdown: links/images keep their text, markers stripped") {
    assert(md("# Head\n> quote **bold**\n- a [b](http://c) d\n1. ![e](f.png) g\n---\ntail") ==
      "Head\nquote bold\na b d\ne g\ntail")
  }

  test("markdown: table pipes collapse to spaces, rules dropped") {
    assert(md("| a | b |\n| --- | --- |\n| c | d |") == "a b\n--- ---\nc d")
    // note: pipe-delimited separator rows are kept as text (documented
    // bound: full GFM table parsing is out of scope) — only BARE
    // horizontal-rule lines drop
    assert(md("x\n***\ny") == "x\ny")
  }
}
