package graft.crawl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fetch validation (SURVEY.md §2.1 S2/S3, §2.2 F4) — the reference's
  * `total_valid` semantics: every candidate document is probed before
  * its payload is accepted.
  *
  * Reference behavior:
  *  - HEAD probe expects status 200 and Content-Type application/pdf
  *    (cninfo_report_crawler.py:129-142);
  *  - when the content type is not PDF, a streaming GET sniffs the
  *    first bytes for the %PDF magic as a fallback
  *    (cninfo_report_crawler.py:143-157);
  *  - the fetch stage re-checks the content type
  *    (report_info_collection.py:257-259).
  *
  * Here status / content_type / magic are plain columns on the probe
  * result, so validation is a codegen'd predicate — cheap metadata
  * first, payload fetch only for survivors (the engine analog of HEAD
  * before GET).
  */
object Validate {

  val PdfContentType = "application/pdf"
  val PdfMagic = "%PDF"

  /** F4 + S3: accept iff the probe returned 200 AND (the declared
    * content type is PDF, or the magic bytes sniff as PDF).
    */
  def isValid(status: Column, contentType: Column, magic: Column): Column =
    status === 200 &&
      (contentType === PdfContentType || substring(magic, 1, 4) === PdfMagic)

  /** Driver/oracle twin of [[isValid]]. */
  def isValidScala(status: Int, contentType: String, magic: String): Boolean =
    status == 200 &&
      (contentType == PdfContentType || (magic != null && magic.startsWith(PdfMagic)))
}
