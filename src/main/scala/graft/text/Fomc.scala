package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** FOMC-minutes parsing — the engine side of the reference's FOMCReader
  * (`finds/readers/fomcreader.py:17-76`; the HTTP fetch is the
  * out-of-scope connector half, the parse below is everything it does
  * with the payloads).
  *
  * Pure Column programs over (link, html) rows — the shape a crawl of
  * the Fed site lands in a doc store (S6): meeting date from the link,
  * paragraph text from the HTML.
  */
object Fomc {

  /** Meeting date from a minutes link: the LAST 8 digits of the string
    * (`dateOf` fomcreader.py:30-32 — `re.sub('\D','',s)[-8:]` as int).
    */
  def dateOfLink(link: Column): Column = {
    val digits = regexp_replace(link, "\\D", "")
    substring(digits, -8, 8).cast("int")
  }

  /** Minutes text from the page HTML (`__getitem__`
    * fomcreader.py:60-76): every <p> block's text joined by "\n\n",
    * inner tags stripped, the basic HTML entities decoded, then
    * `[\r\t]` → space and runs of newlines collapsed — the reference's
    * final `re.sub` pair.
    */
  def minutesText(html: Column): Column = {
    val paras = regexp_extract_all(html, lit("(?is)<p[^>]*>(.*?)</p>"), lit(1))
    val texts = transform(paras, p => {
      val untagged = regexp_replace(p, "(?s)<[^>]+>", "")
      val decoded = Seq(
        "&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<",
        "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'"
      ).foldLeft(untagged) { case (c, (e, r)) => regexp_replace(c, e, r) }
      trim(decoded)
    })
    val joined = array_join(filter(texts, t => length(t) > 0), "\n\n")
    regexp_replace(regexp_replace(joined, "[\\r\\t]", " "), "\\n+", "\n")
  }
}
