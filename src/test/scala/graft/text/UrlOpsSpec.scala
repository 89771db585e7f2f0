package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.canonicalize($"url")).as[String]
      .collect().toSeq

  test("scheme, host case, www and utm params collapse; others survive") {
    val variants = Seq(
      "https://www.Site.COM/a/b?utm_source=rss&id=7",
      "HTTP://site.com/a/b?id=7&utm_medium=email",
      "https://WWW.SITE.com/a/b?id=7")
    assert(canon(variants: _*).distinct == Seq("site.com/a/b?id=7"))
  }

  test("trailing slash trims; root path stays empty; param order is kept") {
    assert(canon("https://x.org/p/") == Seq("x.org/p"))
    assert(canon("https://x.org/") == Seq("x.org"))
    assert(canon("https://x.org/p?b=2&a=1") == Seq("x.org/p?b=2&a=1"))
  }

  test("an all-utm query canonicalizes away entirely (no dangling '?')") {
    assert(canon("https://x.org/p?utm_campaign=x&utm_source=y") ==
      Seq("x.org/p"))
  }

  test("only ONE leading www. strips; inner www survives") {
    assert(canon("https://www.www.x.org/p") == Seq("www.x.org/p"))
    assert(canon("https://wwwx.org/p") == Seq("wwwx.org/p"))
  }

  test("fragments strip; scheme-less URLs parse as host+path") {
    assert(canon("https://x.org/p?id=1#section-2") == Seq("x.org/p?id=1"))
    assert(canon("https://x.org/p#frag") == Seq("x.org/p"))
    assert(canon("www.X.org/p/?utm_s=1") == Seq("x.org/p"))
  }

  test("canonicalHost matches the host part of canonicalize") {
    val url = "HTTPS://WWW.Host.Example.ORG/deep/path?utm_x=1&k=v"
    val (h, c) = Seq(url).toDF("url")
      .select(UrlOps.canonicalHost($"url"), UrlOps.canonicalize($"url"))
      .as[(String, String)].head()
    assert(h == "host.example.org")
    assert(c.startsWith(h))
  }
}
