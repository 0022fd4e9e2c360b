#!/usr/bin/env python3
"""Generate the committed robots-rules fixture (deterministic; run
once, output is committed). The relation is the PARSED form a fetcher
stores after retrieving each host's robots.txt — one row per directive
line: (host, agent, directive, value, rule_order). robots.txt itself
is line-oriented, which the trivial CSV dialect cannot carry in one
field; storing the parsed relation is both CSV-safe and the shape a
100 TB frontier actually persists (parse once per fetch, serve many
admission checks).

Hosts align with the resolved-frontier hosts the html_docs fixture
produces, so the X87 gate composes directly with link_hosts_resolved.
Planted shapes: longest-match override (disallow /p, allow /p1),
allow-wins-tie (equal-length allow+disallow), block-everything
(disallow /), empty-disallow (= allow all, must be IGNORED as a
rule), non-* agents (must be ignored under the documented single-
agent subset), crawl-delay overrides, and rule-free hosts (default
allow, default delay).
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "corpus")

ROWS = [
    # docs.example.com: prefix block with a longer allow carve-out +
    # crawl-delay
    ("docs.example.com", "*", "disallow", "/p", 1),
    ("docs.example.com", "*", "allow", "/p1", 2),
    ("docs.example.com", "*", "crawl-delay", "2", 3),
    # internal.test.net: EMPTY disallow = allow-all (the rule is
    # ignored; URL stays default-allowed) + a delay
    ("internal.test.net", "*", "disallow", "", 1),
    ("internal.test.net", "*", "crawl-delay", "10", 2),
    # cdn.shared.test: block everything
    ("cdn.shared.test", "*", "disallow", "/", 1),
    # crawl8.crawl.test: block the root-relative targets, allow one
    # back at EQUAL length to its blocker (allow wins the tie)
    ("crawl8.crawl.test", "*", "disallow", "/root", 1),
    ("crawl8.crawl.test", "*", "allow", "/sub/", 2),
    ("crawl8.crawl.test", "*", "disallow", "/sub/", 3),
    # cdn.shared.test: a JUNK crawl-delay — non-numeric values are
    # filtered before the min on both engines (TRY_CAST / cast-null),
    # so the host keeps the default delay
    ("cdn.shared.test", "*", "crawl-delay", "n/a", 2),
    # www.example.org: rules for OTHER agents only — ignored entirely
    ("www.example.org", "badbot", "disallow", "/", 1),
    ("www.example.org", "otherbot", "crawl-delay", "99", 2),
    # trapsite.crawl.test: publisher disallows EVERYTHING — the
    # host's already-fetched pages must leave the corpus at the X108
    # pipeline's retroactive-compliance stage, and its outlinks never
    # schedule
    ("trapsite.crawl.test", "*", "disallow", "/", 1),
    # unquoted.test: a specific page blocked + a FRACTIONAL
    # crawl-delay (0.5 s, the wild's most common fractional form):
    # parses through double and ceils to 500 ms — an integer cast
    # would silently fall back to the 1000 ms default
    ("unquoted.test", "*", "disallow", "/u1", 1),
    ("unquoted.test", "*", "crawl-delay", "0.5", 2),
    # tracker.test.net, f.test, x.test, crawl*.crawl.test (others):
    # no rules at all -> default allow, default delay
]


def main():
    os.makedirs(OUT, exist_ok=True)
    for host, agent, directive, value, order in ROWS:
        for f in (host, agent, directive, value):
            assert "," not in f and '"' not in f and "\n" not in f, f
    path = os.path.join(OUT, "robots_rules.csv")
    with open(path, "w") as f:
        f.write("host,agent,directive,value,rule_order\n")
        for host, agent, directive, value, order in ROWS:
            f.write(f"{host},{agent},{directive},{value},{order}\n")
    print(f"wrote {path}: {len(ROWS)} rows")


if __name__ == "__main__":
    main()
