package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus dedup — the standard step between
  * per-doc quality filtering and packing in a crawl pipeline: collapse the
  * scheme/case/www/tracking-param variants of one page to a single key so
  * exact URL dedup and per-domain composition control see through them.
  * (The reference ingests local CSV/JSON only — `Backend/Simulator/
  * FileFormats/read_csv.py:7` — so this is beyond-reference scope, paired
  * with the t21/t22 domain-curation queries.)
  *
  * Canonical form: fragment dropped, scheme dropped (scheme-less input
  * tolerated — the whole string is then host+path), host lowercased with
  * ONE leading `www.` stripped, trailing path `/` trimmed, `utm_*` query
  * params dropped (other params kept in order), empty query dropped.
  *
  * Everything is per-row `functions._` string/array ops (codegen'd, no
  * UDF, no shuffle); the DuckDB twins generate the identical fold so the
  * oracle can run the same canonicalization. */
object UrlOps {

  private val End = lit(1 << 30)

  /** Fragment and scheme dropped — the host+path+query remainder both
    * canonical forms parse. `substring_index` with a missing delimiter
    * returns the whole string, so scheme-less input passes through. */
  private def rest(url: Column): Column =
    substring_index(substring_index(url, "#", 1), "://", -1)

  /** Host part of the canonical form (post lowercase + `www.` strip) —
    * the "domain" key for per-domain caps and composition control. */
  def canonicalHost(url: Column): Column = {
    val host = lower(substring_index(rest(url), "/", 1))
    when(substring(host, 1, 4) === "www.", host.substr(lit(5), End))
      .otherwise(host)
  }

  /** Full canonical URL: host + trimmed path + filtered query. */
  def canonicalize(url: Column): Column = {
    val r = rest(url)
    val rawHost = substring_index(r, "/", 1)
    val pathq = r.substr(length(rawHost) + 1, End)
    val path = substring_index(pathq, "?", 1)
    // '' when there is no '?' (substr past the end is empty in both engines)
    val qs = pathq.substr(length(path) + 2, End)
    val keep = filter(split(qs, "&"),
      x => x =!= "" && substring(x, 1, 4) =!= "utm_")
    val cq = array_join(keep, "&")
    concat(canonicalHost(url), rtrim(path, "/"),
      when(cq === "", "").otherwise(concat(lit("?"), cq)))
  }

  /** DuckDB twin of the fragment/scheme strip. `split_part` returns ''
    * (not the whole string) when the delimiter is absent, so the
    * scheme-less branch needs an explicit CASE to match Spark's
    * `substring_index` semantics. */
  private def restSql(url: String): String = {
    val noFrag = s"split_part($url, '#', 1)"
    s"(CASE WHEN strpos($noFrag, '://') > 0 " +
      s"THEN split_part($noFrag, '://', 2) ELSE $noFrag END)"
  }

  /** DuckDB twin of [[canonicalHost]]. */
  def canonicalHostSql(url: String): String = {
    val host = s"lower(split_part(${restSql(url)}, '/', 1))"
    s"(CASE WHEN substr($host, 1, 4) = 'www.' THEN substr($host, 5) " +
      s"ELSE $host END)"
  }

  /** DuckDB twin of [[canonicalize]]. */
  def canonicalizeSql(url: String): String = {
    val rest = restSql(url)
    val rawHost = s"split_part($rest, '/', 1)"
    val pathq = s"substr($rest, length($rawHost) + 1)"
    val path = s"split_part($pathq, '?', 1)"
    val qs = s"substr($pathq, length($path) + 2)"
    // coalesce: DuckDB's array_to_string of an EMPTY list is NULL, where
    // Spark's array_join is '' — an all-utm query must canonicalize away
    val cq = s"coalesce(array_to_string(list_filter(string_split($qs, '&'), " +
      s"x -> x <> '' AND substr(x, 1, 4) <> 'utm_'), '&'), '')"
    s"(${canonicalHostSql(url)} || rtrim($path, '/') || " +
      s"(CASE WHEN $cq = '' THEN '' ELSE '?' || $cq END))"
  }
}
