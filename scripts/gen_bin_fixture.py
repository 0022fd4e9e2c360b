#!/usr/bin/env python3
"""Deterministic binary-asset fixture for the mime_sniff operator
(fixtures/corpus/binmix/). Committed, like robots_rules.csv, so both
engines sniff the SAME real bytes on disk.

Shapes planted (all content derived from md5 of the file stem — no
randomness):
  - each real type (jpeg/png/gif×2 variants/pdf/zip×2 variants) with a
    matching AND a lying extension,
  - text payloads under media extensions (the classic mislabeled
    asset),
  - an empty file, a 2-byte partial-magic file, a magic-mid-file
    decoy, a PNG with its 8th magic byte corrupted, a BOM'd text
    file, an extension-less file, an UPPERCASE extension.
"""
import hashlib
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                   "corpus", "binmix")

MAGIC = {
    "jpeg": bytes.fromhex("FFD8FFE0"),
    "png": bytes.fromhex("89504E470D0A1A0A"),
    "gif89": b"GIF89a",
    "gif87": b"GIF87a",
    "pdf": b"%PDF-1.7",
    "zip": b"PK\x03\x04",
    "zipempty": b"PK\x05\x06",
}


def payload(stem: str, n: int = 40) -> bytes:
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.md5(f"binmix:{stem}:{i}".encode()).hexdigest().encode()
        i += 1
    return out[:n]


def main():
    os.makedirs(OUT, exist_ok=True)
    for f in os.listdir(OUT):
        os.remove(os.path.join(OUT, f))
    files = {}

    # honest pairs: magic matches extension
    for t, ext in [("jpeg", "jpg"), ("jpeg", "jpeg"), ("png", "png"),
                   ("gif89", "gif"), ("gif87", "gif"), ("pdf", "pdf"),
                   ("zip", "zip"), ("zipempty", "zip")]:
        stem = f"ok_{t}"
        files[f"{stem}.{ext}"] = MAGIC[t] + payload(stem)
    # liars: magic disagrees with extension
    for t, ext in [("jpeg", "png"), ("png", "pdf"), ("pdf", "jpg"),
                   ("zip", "gif"), ("gif89", "zip")]:
        stem = f"lie_{t}_as_{ext}"
        files[f"{stem}.{ext}"] = MAGIC[t] + payload(stem)
    # text payloads under media extensions
    for ext in ["jpg", "png", "zip"]:
        stem = f"text_as_{ext}"
        files[f"{stem}.{ext}"] = payload(stem)
    # hostile tail
    # zero-byte: Spark's binaryFile source silently SKIPS empty files;
    # the oracle excludes them to match and MultimodalSpec pins the
    # skip so an upstream behavior change is caught loudly
    files["empty.jpg"] = b""
    files["tiny.jpg"] = b"\x00"
    files["partial_magic.jpg"] = bytes.fromhex("FFD8")
    files["decoy_mid.pdf"] = b"xx" + MAGIC["pdf"] + payload("decoy")
    bad_png = bytearray(MAGIC["png"])
    bad_png[7] = 0x0B
    files["corrupt_magic.png"] = bytes(bad_png) + payload("badpng")
    files["bom_text.txt"] = b"\xef\xbb\xbf" + payload("bom")
    files["noext"] = payload("noext")
    files["upper.JPG"] = MAGIC["jpeg"] + payload("upper")
    files["spaces in name.pdf"] = MAGIC["pdf"] + payload("sp")
    # exact duplicates (X106): the same PNG bytes re-uploaded twice —
    # once honestly, once under a lying jpg name (byte dedup must
    # collapse across extensions) — and one mirrored pdf pair
    files["reupload_1.png"] = files["ok_png.png"]
    files["reupload_2.jpg"] = files["ok_png.png"]
    files["mirror.pdf"] = files["ok_pdf.pdf"]
    # dup groups pinning RAW name identity across engines inside
    # multi-member groups: spaces, a literal %, and a literal %20
    # (binaryFile's path is FileStatus.getPath.toString — probed NOT
    # percent-encoded, matching read_blob's raw filename; a decode
    # step would throw on the % name and fold %20 into a space)
    files["spaces twin.pdf"] = files["spaces in name.pdf"]
    files["100%.pdf"] = MAGIC["pdf"] + payload("pct")
    files["100% copy.pdf"] = files["100%.pdf"]
    files["lit%20enc.pdf"] = MAGIC["pdf"] + payload("p20")
    files["lit%20enc twin.pdf"] = files["lit%20enc.pdf"]

    for name, content in sorted(files.items()):
        with open(os.path.join(OUT, name), "wb") as fh:
            fh.write(content)
    total = sum(len(c) for c in files.values())
    print(f"wrote {len(files)} files, {total} bytes -> {OUT}")


if __name__ == "__main__":
    main()
