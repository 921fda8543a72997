"""Canonical HTML <-> text: the frozen extraction contract.

The engine's input is Common-Crawl-style pages ``(url, warc_ts, html, text,
lang)`` (BASELINE.json input_hint). The per-row invariant is
``extract_text(html) == text`` **byte-identical per url** — so both the page
generator (writes html from text) and the extractor (recovers text from html)
live here as one frozen pure-function pair with no platform dependence.

The reference has no HTML path (it reads CoNLL files, loader.py:21-42); the
invariant replaces the reference's implicit "the corpus file is the truth"
contract for web-scale input.
"""

from __future__ import annotations

import re

_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]
_P_RE = re.compile(rb"<p>(.*?)</p>", re.DOTALL)
_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.DOTALL)
_HREF_RE = re.compile(rb'<a href="([^"]*)">')


def escape(s: str) -> str:
    for raw, esc in _ESCAPES:
        s = s.replace(raw, esc)
    return s


def unescape(s: str) -> str:
    for raw, esc in reversed(_ESCAPES):
        s = s.replace(esc, raw)
    return s


def page_html(title: str, text: str) -> bytes:
    """Render canonical page HTML. Each line of ``text`` becomes one <p>."""
    parts = [
        "<html><head><title>",
        escape(title),
        "</title></head><body>",
    ]
    if text:
        for line in text.split("\n"):
            parts.append("<p>")
            parts.append(escape(line))
            parts.append("</p>")
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def page_html_linked(title: str, text: str, hrefs: list[str]) -> bytes:
    """Canonical page HTML plus a ``<nav>`` outlink block before ``</body>``.

    The nav block sits OUTSIDE every ``<p>``, so the frozen extraction
    contract is preserved: ``extract_text(page_html_linked(t, text, hs))
    == text`` byte-for-byte, exactly as for :func:`page_html`.  Links are
    recovered with :func:`extract_links` (order-preserving round-trip).
    """
    body = page_html(title, text)
    if not hrefs:
        return body
    nav = "".join(f'<a href="{escape(h)}">' + "</a>" for h in hrefs)
    return body.replace(
        b"</body></html>", b"<nav>" + nav.encode("utf-8") + b"</nav></body></html>"
    )


def extract_links(html: bytes) -> list[str]:
    """All ``<a href>`` targets in document order, entities unescaped."""
    return [unescape(h.decode("utf-8")) for h in _HREF_RE.findall(html)]


def extract_text(html: bytes) -> str:
    """Extract text from canonical HTML: one line per <p>, entities unescaped.

    Inverse of :func:`page_html` by construction — the byte-identity
    invariant ``extract_text(page_html(t, text)) == text`` is property-tested.
    """
    paras = _P_RE.findall(html)
    return "\n".join(unescape(p.decode("utf-8")) for p in paras)


def extract_title(html: bytes) -> str:
    m = _TITLE_RE.search(html)
    return unescape(m.group(1).decode("utf-8")) if m else ""
