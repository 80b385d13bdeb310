#!/usr/bin/env python3
"""Independent WARC/1.0 writer (ISO 28500 framing, one gzip MEMBER per
record — the Common Crawl .warc.gz convention) for the WARC-ingestion
gates. Deliberately NOT via graft's WarcSource: record framing, gzip
membering, and the sidecar offset index are all produced here from the
spec, so the Scala reader is proven against files it never wrote.

Pages wrap the harness documents table's text (read via duckdb — this
tool runs driver-side) in the same boilerplate chrome the HTML-extract
gate uses, so the composed warc→html→curation pipeline is checkable
against a pure-SQL replay:

    url       = https://{source}.example.org/doc/{doc_id}
    extracted = 'Doc {doc_id}' || chr(10) || text

Docs with doc_id % 10 == 0 also appear at a second (mirror.) URL with
an IDENTICAL page, giving the downstream dedup stage real duplicates.
A warcinfo record opens the file and one request record rides along, so
readers must filter by WARC-Type.

Writes OUT (the .warc.gz) and OUT.idx (member byte offsets, one per
line — the cdx-style sidecar that lets executors split WITHIN the file
by positioned reads).

With --wet, writes the WET (extracted-text) sibling instead: one
'conversion' record per page carrying the already-extracted text as a
text/plain payload — the form Common Crawl ships next to each WARC.

Usage: gen_warc_fixture.py OUT.warc.gz SFDIR [--limit N] [--wet]
"""
import argparse
import gzip
import sys


def record(warc_type: str, headers: dict, payload: bytes) -> bytes:
    lines = [b"WARC/1.0\r\n", b"WARC-Type: " + warc_type.encode() + b"\r\n"]
    for k, v in headers.items():
        lines.append(k.encode() + b": " + v.encode() + b"\r\n")
    lines.append(b"Content-Length: " + str(len(payload)).encode() + b"\r\n")
    lines.append(b"\r\n")
    return b"".join(lines) + payload + b"\r\n\r\n"


def http_response(html: bytes) -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html)


def page_html(doc_id: int, text: str) -> bytes:
    return ("<html><head><title>Site - Doc %d</title><style>p{margin:0;}</style>"
            "<script>var t=1<2;track();</script></head>"
            "<body><!-- crawl chrome -->"
            "<header><h1>SiteName</h1></header>"
            "<nav><ul><li><a href=\"/\">Home</a></li></ul></nav>"
            "<div class=\"content\"><h1>Doc %d</h1><p>%s</p></div>"
            "<footer><p>(c) fixture footer</p></footer></body></html>"
            % (doc_id, doc_id, text)).encode("utf-8")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("sfdir")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--wet", action="store_true")
    # multi-file crawl snapshot: shard docs by doc_id % N into
    # out.replace('.warc.gz', f'_{k}.warc.gz'); shard 1 (if present) gets
    # NO .idx sidecar, so readers must mix indexed-split and sequential
    # paths over one corpus — the shape a real snapshot has when some
    # files lack a cdx index
    ap.add_argument("--shards", type=int, default=1)
    a = ap.parse_args()

    import duckdb  # driver-side only; the Scala engine never imports this
    lim = f" LIMIT {a.limit}" if a.limit else ""
    rows = duckdb.sql(
        "SELECT doc_id, source, text FROM "
        f"'{a.sfdir}/documents.parquet' ORDER BY doc_id{lim}").fetchall()

    date = "2026-01-01T00:00:00Z"

    def warcinfo(k):
        return record("warcinfo", {
            "WARC-Date": date,
            "WARC-Record-ID": f"<urn:uuid:00000000-0000-0000-0000-{k:012d}>",
            "Content-Type": "application/warc-fields",
        }, b"software: gen_warc_fixture.py\r\nformat: WARC File Format 1.0\r\n")

    shard_members = [[warcinfo(k)] for k in range(a.shards)]
    members = shard_members[0]  # single-shard callers see the old behavior

    def response(doc_id, url, text, uuid_prefix):
        html = page_html(doc_id, text)
        return record("response", {
            "WARC-Date": date,
            "WARC-Record-ID": f"<urn:uuid:{uuid_prefix}-{doc_id:012d}>",
            "WARC-Target-URI": url,
            "Content-Type": "application/http; msgtype=response",
        }, http_response(html))

    def conversion(doc_id, url, text, uuid_prefix):
        # WET record: the page's EXTRACTED text as a plain payload
        payload = f"Doc {doc_id}\n{text}".encode("utf-8")
        return record("conversion", {
            "WARC-Date": date,
            "WARC-Record-ID": f"<urn:uuid:{uuid_prefix}-{doc_id:012d}>",
            "WARC-Target-URI": url,
            "WARC-Refers-To": f"<urn:uuid:resp-{doc_id:012d}>",
            "Content-Type": "text/plain",
        }, payload)

    make = conversion if a.wet else response
    for doc_id, source, text in rows:
        members = shard_members[doc_id % a.shards]
        url = f"https://{source}.example.org/doc/{doc_id}"
        if doc_id == 0 and not a.wet:  # one request record: readers must filter by type
            members.append(record("request", {
                "WARC-Date": date,
                "WARC-Record-ID": "<urn:uuid:req-000000000000>",
                "WARC-Target-URI": url,
                "Content-Type": "application/http; msgtype=request",
            }, b"GET /doc/0 HTTP/1.1\r\nHost: x\r\n\r\n"))
        members.append(make(doc_id, url, text, "resp" if not a.wet else "conv"))
        if doc_id % 10 == 0:  # identical mirror page -> real duplicate
            members.append(make(
                doc_id, f"https://mirror.{source}.example.org/doc/{doc_id}",
                text, "mirr"))

    n_rec, n_bytes = 0, 0
    for k, members in enumerate(shard_members):
        out = a.out if a.shards == 1 else a.out.replace(".warc.gz", f"_{k}.warc.gz") \
            .replace(".wet.gz", f"_{k}.wet.gz")
        offsets, pos, blobs = [], 0, []
        for m in members:
            blob = gzip.compress(m, 6)
            offsets.append(pos)
            pos += len(blob)
            blobs.append(blob)
        with open(out, "wb") as f:
            for b in blobs:
                f.write(b)
        if not (a.shards > 1 and k == 1):  # shard 1 stays sidecar-less
            with open(out + ".idx", "w") as f:
                f.write("\n".join(str(o) for o in offsets) + "\n")
        n_rec += len(members)
        n_bytes += pos
    print(f"wrote {n_rec} records, {n_bytes} bytes", file=sys.stderr)


if __name__ == "__main__":
    main()
