#!/usr/bin/env python3
"""Generate the committed RAW robots.txt fixture (deterministic; run
once, output is committed): one file per host under
fixtures/corpus/robots/, real multi-line bodies as a fetcher stores
them — the input X100's parser turns into the rules relation X87
consumes (robots_rules.csv stays the hand-curated gate fixture).

Shapes: comment lines + inline comments, blank lines, CRLF endings,
mixed-case directives, spaces around the colon, multiple user-agent
lines sharing one group (RFC 9309 group headers), rules before any
user-agent (invalid → dropped), unknown directives (sitemap — parsed,
consumers filter), empty disallow values, junk lines without a colon,
values containing colons.
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                   "corpus", "robots")

FILES = {
    # plain single group, comments, blank lines, CRLF line endings;
    # the Sitemap line sits BEFORE the first user-agent group — the
    # common top-of-file placement RFC 9309 allows for non-group
    # records (the parse must emit it even though group rules up
    # there are invalid and drop)
    "a.test.txt": "\r\n".join([
        "# robots for a.test",
        "Sitemap: http://a.test/sitemap-index.xml",
        "User-agent: *",
        "Disallow: /private",
        "Allow: /private/ok  # carve-out",
        "Crawl-delay: 5",
        "",
        "# trailing comment",
    ]),
    # two UA lines SHARE one group; a second group for bot2 only
    "multi.test.txt": "\n".join([
        "User-agent: googlebot",
        "User-agent: *",
        "Disallow: /shared",
        "",
        "User-agent: bot2",
        "Disallow: /bot2only",
        "Allow: /bot2only/sub",
    ]),
    # hostile: rules before any UA (dropped), mixed case, spaced
    # colons, unknown directive with a colon in its value, empty
    # disallow, junk line, inline comment on the UA line
    "sloppy.test.txt": "\n".join([
        "Disallow: /orphan-rule-no-group",
        "USER-AGENT : SpiderBot  # caps + spaced colon",
        "DISALLOW : /Caps",
        "disallow:",
        "Sitemap: http://sloppy.test/sitemap.xml",
        "this line has no colon and is junk",
        "allow:/nospace",
    ]),
    # comments and whitespace only — parses to zero rows
    "empty.test.txt": "\n".join([
        "# nothing to see",
        "   ",
        "",
    ]),
    # budget hosts (present in the html fixture's resolved frontier):
    # a PUBLISHER-declared Crawl-delay the X86 schedule must obey —
    # docs.example.com is heuristically HOT (2000ms) but declares 10s;
    # its robots also declares a Sitemap (the X101 third discovery
    # channel: a URL no outlink and no sitemap fixture loc carries)
    "docs.example.com.txt": "\n".join([
        "User-agent: *",
        "Crawl-delay: 10",
        "Sitemap: http://docs.example.com/sitemap.xml",
    ]),
    # heuristically COLD (1000ms) but declares a FRACTIONAL 2.5s —
    # the declared value must win over BOTH heuristic tiers, and the
    # fractional form (common in the wild) must parse through double
    # and ceil to 2500 ms, not null out under an integer cast; the
    # junk value must be ignored (filtered before the min), never
    # poison the numeric one
    "tracker.test.net.txt": "\n".join([
        "User-agent: *",
        "Crawl-delay: 2.5",
        "Crawl-delay: soonish",
    ]),
}


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, body in sorted(FILES.items()):
        path = os.path.join(OUT, name)
        with open(path, "w", newline="") as f:
            f.write(body + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
