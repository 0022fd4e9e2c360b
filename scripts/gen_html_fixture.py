#!/usr/bin/env python3
"""Generate the committed HTML-corpus fixture (deterministic; run once,
output is committed). The driver testdata documents are plain word soup
with no markup, so the X82 extraction operator reads this fixture
instead — same pattern as the PII corpus: the Spark side and the DuckDB
oracle both read the identical committed file.

Pages are synthetic crawl-shaped HTML: nav/footer boilerplate blocks,
inline links, script/style/comment/CDATA regions, named entities
(including double-encoded ones), plus a hostile tail (unclosed script,
unclosed tag at EOF, tag-soup, nested CDATA, entity bombs, attributes
in single quotes, uppercase tags).

CSV parseability is kept trivial FOR BOTH ENGINES by construction:
no field ever contains a comma, a double quote, or a newline (HTML
needs none of them — attributes use single quotes or none, commas
appear only as the &#44; entity). The generator asserts this. The
real-world shapes the dialect CANNOT carry (multiline blocks,
double-quoted attributes) are covered by toDF rows in
HtmlExtractSpec's real-input battery instead.

Each page carries its own page_url (the URL it was fetched from) so
the X83b resolved link rollup can resolve relative/protocol-relative
hrefs against it.
"""
import hashlib
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "corpus")

WORDS = ("the quick brown fox jumps over a lazy dog while data flows "
         "through batch and stream layers with schema checks "
         "every page carries some prose that reads like crawl text "
         "tables join filters push down partitions shuffle keys spill "
         "tokens shingle bands hash buckets probe index merge compact "
         "rows columns types nulls quote escape header footer nav "
         "links hosts frontier politeness budget fetch parse render").split()

HOSTS = ["docs.example.com", "internal.test.net", "www.example.org"]


def filler(i, n):
    # hash-driven word draw over the full vocabulary: the previous
    # (i*7+j) % 19 cyclic draw gave every long page the SAME distinct
    # 3-gram shingle set (a 19-periodic sequence has only 19 distinct
    # 3-grams), which would make a MinHash near-dup stage collapse the
    # whole fixture into one cluster — degenerate, not crawl-shaped.
    # md5 is stable across python versions (the fuzz-piece pattern).
    # n is part of the key: filler(i, 16) must NOT be a prefix of
    # filler(i, 25) — distinct families reuse small indexes, and a
    # shared 16-word prefix is a genuine near-dup the MinHash stage
    # would (correctly but confusingly) collapse across sources.
    def w(j):
        h = hashlib.md5(f"w:{i}:{n}:{j}".encode())
        return WORDS[int(h.hexdigest()[:8], 16) % len(WORDS)]
    return " ".join(w(j) for j in range(n))


def link(i, j, text=None):
    t = text if text is not None else f"{WORDS[(i + j) % len(WORDS)]} page{j}"
    return (f"<a href='http://{HOSTS[(i + j) % len(HOSTS)]}/p{j}.html' "
            f"class='l{j % 3}'>{t}</a>")


def nav(i, n_links=4):
    items = " ".join(f"<li>{link(i, j)}</li>" for j in range(n_links))
    return f"<nav id='topnav'><ul>{items}</ul></nav>"


def footer(i):
    return (f"<footer><p>site footer {link(i, 9, 'terms')} "
            f"{link(i, 10, 'privacy')} &copy; example</p></footer>")


def script(i):
    # fake tags and entities INSIDE the script must not leak to text
    return ("<script type='text/javascript'>var x = 1 < 2; "
            f"document.write('<p>generated {i}</p>'); "
            "if (x &amp;&amp; true) {} </script>")


def style():
    return "<style>.l0 { color: red; } p > em { display: none; }</style>"


def page(i, body, with_nav=True, with_footer=True, with_script=True):
    head = (f"<head><title>page {i}</title>"
            + (script(i) if with_script else "") + style() + "</head>")
    parts = ["<html>", head, "<body>"]
    if with_nav:
        parts.append(nav(i))
    parts.append(body)
    if with_footer:
        parts.append(footer(i))
    parts += ["</body>", "</html>"]
    return "".join(parts)


def page_url(source, i):
    # per-source crawl host; a handful of deterministic shape variants
    # so resolution exercises root pages, nested dirs and query pages
    host = f"{source}.crawl.test"
    if i % 5 == 0:
        return f"http://{host}/"                       # site root
    if i % 5 == 1:
        return f"http://{host}/a/b/page{i}.html"       # nested dir
    if i % 5 == 2:
        return f"https://{host}/p{i}"                  # https, no ext
    if i % 5 == 3:
        return f"http://{host}/list?page={i}"          # query page
    return f"http://{host}/a/page{i}.html"


def rows():
    out = []
    i = 0

    def add(source, html):
        nonlocal i
        out.append((i, source, page_url(source, i), html))
        i += 1

    # --- articles: long body text, some inline links, full chrome ---
    for k in range(40):
        body = (f"<h1>article {k}</h1>"
                f"<p>{filler(k, 18)} {link(k, 5)} {filler(k + 1, 14)}</p>"
                f"<!-- editorial note {k} -->"
                f"<p>{filler(k + 2, 20)} &amp; {filler(k + 3, 9)}</p>")
        add("crawl0", page(k, body))

    # --- link farms: almost all anchor text, no nav/footer tags ---
    for k in range(12):
        links = " ".join(link(k, j) for j in range(12))
        body = f"<div class='farm'>{links} {filler(k, 2)}</div>"
        add("crawl1", page(k, body, with_nav=False, with_footer=False,
                           with_script=False))

    # --- plain-text pages: no tags at all ---
    for k in range(10):
        add("crawl2", filler(k, 25))

    # --- entity showcase (incl. double-encoded + numeric + comma) ---
    for k in range(10):
        body = (f"<p>a &lt;tag&gt; literal&#44; a &quot;quote&quot; "
                f"and &#39;apostrophes&#39; &apos;both&apos; "
                f"plus&nbsp;nbsp &amp;lt; stays encoded "
                f"it&#8217;s &#8220;smart&#8221; &#8211; em&#8212;dash "
                f"hex&#x2019;s&#x2026; nb&#160;sp {filler(k, 8)}</p>")
        add("crawl3", page(k, body))

    # --- CDATA blocks (content stripped with the block) ---
    for k in range(6):
        body = (f"<p>{filler(k, 6)}</p>"
                f"<![CDATA[ raw <b>not text</b> {k} ]]>"
                f"<p>{filler(k + 1, 6)}</p>")
        add("crawl4", page(k, body))

    # --- boilerplate-only pages: nav + footer, no body content ---
    for k in range(6):
        add("crawl5", page(k, "", with_script=False))

    # --- link-normalization showcase: fragments, tracking params,
    # uppercase hosts, relative links — the X83 canonicalization rows
    for k in range(8):
        body = (f"<p>{filler(k, 6)} "
                f"<a href='http://Docs.Example.COM/p{k}.html#section{k}'>"
                f"frag</a> "
                f"<a href='http://docs.example.com/p{k}.html?utm_source=feed&utm_campaign=c{k}'>"
                f"tracked</a> "
                f"<a href='/relative/path{k}'>rel</a> "
                f"<a href='https://tracker.test.net/x?id={k}&utm_medium=m'>"
                f"mixed</a> "
                # utm-FIRST: stripping ?utm_source glues &id to the
                # path; the glue re-anchor must fold this with the
                # canonical ?id={k} twin (ADVICE r13)
                f"<a href='http://docs.example.com/q.html?utm_source=s&id={k}'>"
                f"utm first</a> "
                f"<a href='http://docs.example.com/q.html?id={k}'>"
                f"canon</a></p>")
        add("crawl6", page(k, body, with_nav=False, with_footer=False,
                           with_script=False))

    # --- link-resolution showcase: relative paths, root-relative,
    # protocol-relative, unquoted hrefs, non-http schemes — the X83b
    # rows; each resolves against THIS page's page_url
    for k in range(8):
        body = (f"<p>{filler(k, 5)} "
                f"<a href='sub/rel{k}.html'>relative path</a> "
                f"<a href='/root/abs{k}.html'>root relative</a> "
                f"<a href='//cdn.shared.test/lib{k}.js'>proto relative</a> "
                f"<a href=http://unquoted.test/u{k}>unquoted</a> "
                f"<a href='mailto:crawl{k}@example.org'>mail</a> "
                f"<a href='#section{k}'>self</a></p>")
        add("crawl8", page(k, body, with_nav=False, with_footer=False,
                           with_script=False))

    # --- crawl duplicates: same BODY under different chrome (mirrors,
    # tracking variants) — the X84 dedup stage must collapse each pair
    # AFTER extraction, which raw-byte dedup cannot
    for k in range(4):
        # page(k // 2, ...): the TITLE is extracted text and must match
        # within a mirror pair; only removed regions (comments, script,
        # nav/footer link targets) differ between the two fetches
        body = f"<p>mirrored article {k // 2} {filler(k // 2, 16)}</p>"
        chrome_comment = f"<!-- mirror {k} fetched at t{k} -->"
        add("crawl7", page(k // 2, body + chrome_comment,
                           with_nav=False, with_footer=False,
                           with_script=(k % 2 == 0)))

    # --- EDITED mirror pair: same long body, one appended word — the
    # near-dup stage's target (exact dedup on extracted text CANNOT
    # collapse these; the minhash pass must)
    for k in range(2):
        body = (f"<p>edited mirror {filler(100, 30)}"
                + (" updated</p>" if k == 1 else "</p>"))
        add("crawl7", page(2, body, with_nav=False, with_footer=False,
                           with_script=False))

    # --- URL fuzz: hash-driven href shapes -----------------------------
    # every row round-trips BOTH engines' full normalize+resolve chain
    # in the link_hosts_resolved / robots_gate / crawl_budget oracle
    # compares — cross-engine fuzz for the URL dialect, same pattern
    # as the tag-soup family below (CSV-safe: single quotes, no commas)
    import hashlib as _h

    def upick(seq, *keys):
        h = _h.md5(("u:" + ":".join(str(k) for k in keys)).encode())
        return seq[int(h.hexdigest()[:8], 16) % len(seq)]

    u_hosts = ["http://Fz.Example.COM", "https://fz.example.com",
               "http://fz2.test:8080", "http://fz3.test", ""]
    u_paths = ["", "/", "/p", "/a/b.html", "/a&b", "/dir/", "sub/rel.html",
               "../up.html", "//cdn.fz.test/l.js", "mailto:x@fz.test",
               "/UPPER/Case"]
    u_query = ["", "?id=1", "?utm_source=s", "?utm_a=1&id=2",
               "?id=1&utm_b=2", "?utm_a=1&utm_b=2", "?",
               "?utm_a=1&utm_b=2&c=3", "&glued=1"]
    u_frag = ["", "#x", "#sec 2", "##"]
    for k in range(16):
        links = " ".join(
            f"<a href='{upick(u_hosts, k, j, 'h')}"
            f"{upick(u_paths, k, j, 'p')}"
            f"{upick(u_query, k, j, 'q')}"
            f"{upick(u_frag, k, j, 'f')}'>u{j}</a>"
            for j in range(6))
        body = f"<p>{filler(k, 8)} {links}</p>"
        add("urlfuzz", page(k, body, with_nav=False, with_footer=False,
                            with_script=False))

    # --- deterministic fuzz: hash-driven tag soup ----------------------
    # Every row round-trips through BOTH engines' extraction chains in
    # the oracle compare, so this is cross-engine fuzz, not a local
    # battery. Pieces are drawn by md5 (stable across python versions,
    # unlike random.seed state guarantees).
    import hashlib

    def pick(seq, *keys):
        h = hashlib.md5(":".join(str(k) for k in keys).encode())
        return seq[int(h.hexdigest()[:8], 16) % len(seq)]

    pieces = [
        "<b>", "</b>", "<i>", "</I>", "<div class='x'>", "</div>",
        "<p>", "</p>", "<br/>", "<span", "</span>", "<", ">", "<>",
        "&amp;", "&lt;", "&gt;", "&nbsp;", "&bogus;", "&#39;",
        "&amp;amp;", "&", ";", "<!-- c -->", "<!--", "-->",
        "<![CDATA[ x ]]>", "<![CDATA[", "]]>",
        "<script>s</script>", "<script>", "</script>",
        "<style>.a{}</style>", "<nav>n</nav>", "<footer>f</footer>",
        "<a href='http://f.test/p'>L</a>", "<a href='/r'>R</a>",
        "<a href='", "'>", "</a>", " ",
    ]
    for k in range(24):
        n = 10 + (k * 7) % 30
        soup = " ".join(
            pick(pieces, "fz", k, j) if j % 3 else filler(k + j, 2)
            for j in range(n))
        add("fuzz", soup.replace("  ", " ").strip())

    # --- hostile tail -------------------------------------------------
    # unclosed script: no </script>, so the block regex cannot match
    # and the code LEAKS into text minus its tags (documented behavior)
    add("hostile", "<html><body><script>var leak = 'code';"
                   f"<p>{filler(1, 6)}</p></body></html>")
    # unclosed tag at EOF: no closing '>' — the fragment stays as text
    add("hostile", f"<html><body><p>{filler(2, 6)}</p><div class='x")
    # malformed nesting: '<div <span>' parses as ONE tag up to the
    # first '>'
    add("hostile", f"<html><body><div <span>{filler(3, 6)}</div></body>")
    # nested CDATA: inner ']]>' closes the non-greedy match; the tail
    # 'c ]]>' survives region removal, loses '>'-terminated fragments
    # at the tag strip, and the rest lands in text
    add("hostile", "<html><body><![CDATA[a <![CDATA[b ]]> c ]]>"
                   f"<p>{filler(4, 6)}</p></body></html>")
    # entity bomb: deeply double-encoded — ONE decode pass only, the
    # remainder must stay literal (no iterative re-decoding)
    add("hostile", "<html><body><p>" + "&amp;" * 40 + "amp;lt;bomb"
                   f" {filler(5, 4)}</p></body></html>")
    # tag soup
    add("hostile", f"<html><<<>>><p>{filler(6, 6)}</p><><b></html>")
    # uppercase tags + uppercase boilerplate blocks
    add("hostile", f"<HTML><BODY><NAV>{link(7, 1)}</NAV>"
                   f"<P>{filler(7, 8)}</P><FOOTER>done</FOOTER>"
                   "</BODY></HTML>")
    # comment that contains tag-like and entity-like content
    add("hostile", f"<html><body><!-- <p>ghost</p> &amp; more -->"
                   f"<p>{filler(8, 6)}</p></body></html>")
    # whitespace-only content
    add("hostile", "<html><body><p> \t </p></body></html>")
    # anchor with nested markup inside (tags stripped from link text)
    add("hostile", "<html><body><a href='http://x.test/'>"
                   f"<b>bold</b> link text</a> {filler(9, 6)}</body></html>")
    # script containing a fake </style> and style containing fake
    # </script> — each block closes only on its own terminator
    add("hostile", "<html><head><script>a = '</style>' + 1;</script>"
                   "<style>em:after { content: 'x</scrip'; }</style>"
                   f"</head><body><p>{filler(10, 6)}</p></body></html>")

    # --- crawl traps: the two URL-shape pathologies a frontier must
    # cap (X96) — a session-id host exploding ONE path into many query
    # variants, and a calendar host digging ever-deeper date paths.
    # Every other family's hosts are the healthy contrast. Appended
    # LAST so earlier families keep their doc_ids stable.
    for k in range(4):
        sess = " ".join(
            f"<a href='http://trap.fz.test/listing?sid=s{k}x{j}&page=1'>"
            f"v{j}</a>" for j in range(10))
        cal = (f"<a href='http://cal.fz.test/"
               + "/".join(f"d{x}" for x in range(9 + k))
               + "/index.html'>deep</a>")
        body = f"<p>{filler(k, 10)} {sess} {cal}</p>"
        add("trapsite", page(k, body, with_nav=False, with_footer=False,
                             with_script=False))
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    rs = rows()
    for _, _, u, h in rs:
        for field in (u, h):
            assert "," not in field and '"' not in field \
                and "\n" not in field, field
            assert field == field.strip(), repr(field)
            assert all(ord(c) < 128 for c in field), field
    path = os.path.join(OUT, "html_docs.csv")
    with open(path, "w") as f:
        f.write("doc_id,source,page_url,html\n")
        for i, s, u, h in rs:
            f.write(f"{i},{s},{u},{h}\n")
    print(f"wrote {path}: {len(rs)} rows")


if __name__ == "__main__":
    main()
