"""URL canonicalization for web-scale dedup pipelines.

The first dedup key of any web corpus is the canonical URL: the same
page arrives as ``HTTP://WWW.Site.COM:80/a/?utm_source=feed#top`` and
``http://site.com/a``.  This module canonicalizes entirely in
dialect-shared SQL built-ins (split_part / lower / regexp_replace —
whole-stage-codegen on the Spark side, no Python anywhere), so the
DuckDB oracle runs the semantically identical chain and the gate is
bit-exact.

Canonical form (documented, deliberately conservative):
  - scheme and host lowercased; path/query case preserved
  - leading ``www.`` stripped from the host
  - default ports dropped (http:80, https:443); other ports kept
  - fragment dropped
  - ``utm_*`` tracking parameters dropped (other params preserved in
    their original order — parameter SORTING is not applied, two urls
    that differ only in param order stay distinct)
  - trailing path slash collapsed (both ``/a/`` and ``/a/?q`` forms);
    empty path becomes ``/``

The synthetic messy-URL generator (``synth_url_sql``) derives every
kind of mess deterministically from doc_id with modular arithmetic
shared verbatim between dialects, the same scheme q_text_extract uses
for its html envelopes.
"""

from __future__ import annotations

from .texthash import Dialect


def synth_url_sql(id_col: str) -> str:
    """Deterministic messy URL from an integer id (dialect-shared SQL:
    only CASE / % / || / CAST-free implicit concat)."""
    i = id_col
    return (
        f"(CASE WHEN {i} % 2 = 0 THEN 'HTTP' ELSE 'http' END || '://' || "
        f"CASE WHEN {i} % 3 = 0 THEN 'WWW.' ELSE '' END || "
        f"'Site' || ({i} % 7) || '.ExAmPle.com' || "
        f"CASE WHEN {i} % 5 = 0 THEN ':80' WHEN {i} % 5 = 1 THEN ':8080' ELSE '' END || "
        f"'/Path' || ({i} % 13) || "
        f"CASE WHEN {i} % 4 = 0 THEN '/' ELSE '' END || "
        f"CASE WHEN {i} % 6 = 0 THEN '?utm_source=feed&utm_campaign=x&id=' || {i} "
        f"     WHEN {i} % 6 = 3 THEN '?id=' || {i} ELSE '' END || "
        f"CASE WHEN {i} % 9 = 0 THEN '#Section2' ELSE '' END)"
    )


def canonical_parts_sql(d: Dialect, url: str) -> dict[str, str]:
    """SQL expressions for (scheme, host, port-part, canonical path)."""
    scheme = f"lower(split_part({url}, '://', 1))"
    rest = f"split_part({url}, '://', 2)"
    hostport = f"split_part({rest}, '/', 1)"
    # path+query+fragment (may be empty); substr is 1-based in both
    pathq = f"substr({rest}, length({hostport}) + 1)"
    host = d.regexp_replace(f"lower(split_part({hostport}, ':', 1))", "^www[.]", "")
    port = f"split_part({hostport}, ':', 2)"
    portpart = (
        f"(CASE WHEN {port} = '' "
        f"  OR ({scheme} = 'http' AND {port} = '80') "
        f"  OR ({scheme} = 'https' AND {port} = '443') "
        f"THEN '' ELSE ':' || {port} END)"
    )
    # fragment off first, then utm params (backref-free, order-safe):
    # 1) every '&utm_x=v' goes;  2) a leading '?utm_x=v&' promotes the
    # next param to '?';  3) a lone '?utm_x=v' goes entirely
    p = f"split_part({pathq}, '#', 1)"
    p = d.regexp_replace(p, "&utm_[a-z]+=[^&#]*", "")
    p = d.regexp_replace(p, "[?]utm_[a-z]+=[^&#]*&", "?")
    p = d.regexp_replace(p, "[?]utm_[a-z]+=[^&#]*$", "")
    # trailing-slash collapse: both the bare-path form ('/a/' -> '/a')
    # and the before-query form ('/a/?x' -> '/a?x') — otherwise the
    # same logical page with and without the path slash would keep two
    # distinct canonical urls and dedup would miss the group
    p = d.regexp_replace(p, "/[?]", "?")
    p = d.regexp_replace(p, "/$", "")
    path = f"(CASE WHEN {p} = '' THEN '/' ELSE {p} END)"
    return {"scheme": scheme, "host": host, "portpart": portpart, "path": path}


def canonical_url_sql(d: Dialect, url: str) -> str:
    c = canonical_parts_sql(d, url)
    return f"({c['scheme']} || '://' || {c['host']} || {c['portpart']} || {c['path']})"
