#!/usr/bin/env python3
"""Generate the committed PII-corpus fixture (deterministic; run once,
output is committed). The driver testdata documents are synthetic word
soup with no PII-shaped strings, so the redaction operator reads this
fixture instead — same pattern as the ingest CSVs: the Spark side and
the DuckDB oracle both read the identical committed file.

Every row deterministically embeds zero or more of: email addresses,
http(s) URLs, IPv4 addresses, US-style phone numbers — woven into
plain filler text, including edge shapes (PII at start/end of text,
adjacent punctuation, multiple of one kind).
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "corpus")

WORDS = ("the quick brown fox jumps over a lazy dog while data flows "
         "through batch and stream layers with schema checks").split()

DOMAINS = ["example.com", "mail.test.org", "corp.example.co.uk"]
HOSTS = ["docs.example.com", "internal.test.net", "www.example.org"]


def filler(i, n):
    return " ".join(WORDS[(i * 5 + j) % len(WORDS)] for j in range(n))


def email(i):
    return f"user{i}.last{i % 7}@{DOMAINS[i % len(DOMAINS)]}"


def url(i):
    scheme = "https" if i % 3 else "http"
    return f"{scheme}://{HOSTS[i % len(HOSTS)]}/path{i}/page_{i % 13}.html"


def ip(i):
    return f"10.{i % 256}.{(i * 7) % 256}.{(i * 13) % 255 + 1}"


def phone(i):
    a, b, c = 200 + i % 700, 100 + (i * 3) % 900, 1000 + (i * 17) % 9000
    return f"({a}) {b}-{c}" if i % 2 else f"{a}-{b}-{c}"


def text_for(i):
    parts = [filler(i, 4 + i % 5)]
    if i % 3 == 0:
        parts.append(f"contact {email(i)} for access")
    if i % 4 == 0:
        parts.append(f"see {url(i)} for details")
    if i % 5 == 0:
        parts.append(f"host at {ip(i)} responded")
    if i % 6 == 0:
        parts.append(f"call {phone(i)} today")
    if i % 7 == 0:  # PII adjacent to punctuation and a second email
        parts.append(f"cc: {email(i + 1)}, backup {email(i + 2)}.")
    if i % 11 == 0:  # PII at the very start / very end of the text
        return f"{url(i)} " + " ".join(parts) + f" {ip(i + 3)}"
    parts.append(filler(i + 1, 3))
    return " ".join(parts)


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = ["doc_id,source,text"]
    for i in range(400):
        src = f"feed{i % 8}"
        t = text_for(i).replace('"', "")
        # quote the text field (it contains commas via the cc: case)
        rows.append(f'{i},{src},"{t}"')
    with open(os.path.join(OUT, "pii_docs.csv"), "w", newline="") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {len(rows) - 1} rows to {OUT}/pii_docs.csv")


if __name__ == "__main__":
    main()
