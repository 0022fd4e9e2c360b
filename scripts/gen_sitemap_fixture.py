#!/usr/bin/env python3
"""Generate the committed sitemap fixture (deterministic; run once,
output is committed). Sitemaps are the publisher-DECLARED frontier —
the complement of the outlink-observed one (X88) — so the fixture
plants both novelty classes: locs that exactly match crawled
page_urls from html_docs.csv (via the shared page_url() shape
function) and locs the crawl has never seen.

Shapes covered, per the sitemap protocol's real-world abuses:
  - plain <url><loc>…</loc><lastmod>YYYY-MM-DD</lastmod></url>
  - missing <lastmod> (optional per protocol)
  - whitespace/newline-free padding inside <loc> (the CSV dialect is
    newline-free; intra-tag spaces exercise the trim)
  - uppercase host + fragment + utm params in the loc (normalization
    must fold them)
  - CROSS-HOST locs (protocol violation: a sitemap may only name URLs
    on its own host — dropped, counted by the spec)
  - duplicate locs with different lastmods (keep the LATEST)
  - empty <loc>, <url> blocks without <loc>, malformed lastmod
    (full W3C datetimes are out of the deterministic subset → null)
  - uppercase tag spellings (<LOC>)

CSV dialect matches html_docs.csv: no commas, double quotes, or
newlines in any field (asserted below).
"""
import os

from gen_html_fixture import page_url

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "corpus")


def url_entry(loc, lastmod=None):
    lm = f"<lastmod>{lastmod}</lastmod>" if lastmod else ""
    return f"<url><loc>{loc}</loc>{lm}</url>"


def rows():
    out = []

    def add(host, entries):
        out.append((host, f"http://{host}/sitemap.xml",
                    f"<urlset>{''.join(entries)}</urlset>"))

    # crawl0: mixes already-crawled page_urls (doc ids 0..39 belong to
    # crawl0 in html_docs.csv — NOT novel) with fresh paths (novel)
    add("crawl0.crawl.test",
        [url_entry(page_url("crawl0", i), f"2024-03-{10 + i:02d}")
         for i in range(0, 6)] +
        [url_entry(f"http://crawl0.crawl.test/fresh/n{i}.html",
                   f"2024-04-{i + 1:02d}") for i in range(4)])

    # docs.example.com: all novel, one duplicate loc with two lastmods
    # (keep the later), one missing lastmod, one loc with tracking
    # params + fragment that must fold with its clean twin
    add("docs.example.com", [
        url_entry("http://docs.example.com/guide/intro.html",
                  "2024-01-05"),
        url_entry("http://docs.example.com/guide/intro.html",
                  "2024-02-17"),
        url_entry("http://docs.example.com/guide/setup.html"),
        url_entry("http://docs.example.com/guide/api.html?"
                  "utm_source=sitemap#top", "2024-02-01"),
        url_entry("http://docs.example.com/guide/api.html",
                  "2024-01-20"),
        url_entry("http://DOCS.EXAMPLE.COM/Guide/MIXED.html",
                  "2024-02-02"),
        # ALSO an outlink target in html_docs.csv (nav links point at
        # docs.example.com/p1.html) — the X101 cross-channel fold case
        url_entry("http://docs.example.com/p1.html", "2024-02-20"),
    ])

    # hostile host: cross-host locs (dropped), empty loc, url block
    # with no loc, malformed lastmod (null), uppercase tags, padded loc
    add("sloppy.test", [
        url_entry("http://evil.test/steal.html", "2024-01-01"),
        url_entry("https://other.example.org/x", "2024-01-02"),
        url_entry("", "2024-01-03"),
        "<url><lastmod>2024-01-04</lastmod></url>",
        url_entry("http://sloppy.test/ok.html", "January 5th 2024"),
        url_entry("http://sloppy.test/w3c.html",
                  "2024-01-06T10:30:00+00:00"),
        "<URL><LOC>http://sloppy.test/upper.html</LOC>"
        "<LASTMOD>2024-01-07</LASTMOD></URL>",
        url_entry("  http://sloppy.test/padded.html  ", "2024-01-08"),
    ])

    # empty sitemap — host appears with zero URLs
    add("empty.test", [])

    # deterministic fuzz: md5-driven loc/lastmod shapes, every row
    # round-tripping BOTH engines' parse + normalize + validate chain
    # in the oracle compare (the html urlfuzz pattern). CSV-safe by
    # construction (no commas/quotes/newlines in any piece).
    import hashlib as _h

    def fpick(seq, *keys):
        h = _h.md5(("smfuzz:" + ":".join(str(k) for k in keys)).encode())
        return seq[int(h.hexdigest()[:8], 16) % len(seq)]

    f_scheme = ["http://", "https://", ""]
    f_host = ["smfuzz.test", "SMFUZZ.TEST", "other.test", ""]
    f_path = ["", "/", "/p", "/a/b.html", "/dir/", "/UPPER"]
    f_query = ["", "?id=1", "?utm_source=x", "?utm_a=1&id=2"]
    f_frag = ["", "#x"]
    f_pad = ["", " ", "  "]
    f_lm = [None, "2024-07-01", "2024-07-01T10:00:00Z", "bogus date",
            "2024-13-40"]
    entries = []
    for j in range(24):
        loc = (fpick(f_pad, j, "p1") + fpick(f_scheme, j, "s")
               + fpick(f_host, j, "h") + fpick(f_path, j, "pa")
               + fpick(f_query, j, "q") + fpick(f_frag, j, "f")
               + fpick(f_pad, j, "p2"))
        entries.append(url_entry(loc, fpick(f_lm, j, "lm")))
    add("smfuzz.test", entries)

    # bulk host: deterministic novel backlog for rollup shape
    add("bulk.test",
        [url_entry(f"http://bulk.test/item/{i:03d}",
                   f"2024-05-{(i % 28) + 1:02d}") for i in range(40)])

    # MIXED-CASE host value: the operator must lower the emitted host
    # (the outlink channel keys on hosts from lowercased normalized
    # URLs — a raw mixed-case host would never fold in discovery_feed)
    add("MixedCase.Test", [
        url_entry("http://mixedcase.test/page.html", "2024-06-01"),
        url_entry("http://MIXEDCASE.TEST/upper.html", "2024-06-02"),
    ])

    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    rs = rows()
    for host, sm_url, xml in rs:
        for field in (host, sm_url, xml):
            assert "," not in field and '"' not in field \
                and "\n" not in field, field
            assert all(ord(c) < 128 for c in field), field
    path = os.path.join(OUT, "sitemaps.csv")
    with open(path, "w") as f:
        f.write("host,sitemap_url,xml\n")
        for host, sm_url, xml in rs:
            f.write(f"{host},{sm_url},{xml}\n")
    print(f"wrote {path}: {len(rs)} rows")


if __name__ == "__main__":
    main()
