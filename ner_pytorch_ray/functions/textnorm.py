"""Text normalization — the byte-identical scalar contracts.

Reference semantics (cited for parity; re-implemented from scratch):
  - zero_digits: /root/reference/utils.py:70-74
  - unicode_to_ascii: /root/reference/loader.py:14-19
  - cap_feature: /root/reference/loader.py:113-128

These are frozen pure functions with no locale or platform dependence so the
per-row invariant ``extract(html) == text`` holds byte-for-byte across
workers, Ray versions and platforms.
"""

from __future__ import annotations

import re
import string
import unicodedata

_DIGIT_RE = re.compile(r"\d")
_ASCII_KEEP = frozenset(string.ascii_letters + " .,;'-")


def zero_digits(s: str) -> str:
    """Replace every digit with '0' (reference utils.py:70-74)."""
    return _DIGIT_RE.sub("0", s)


def unicode_to_ascii(s: str) -> str:
    """NFD-normalize, drop combining marks, keep ASCII letters + `` .,;'-``.

    Byte-identical to reference loader.py:14-19.
    """
    return "".join(
        c
        for c in unicodedata.normalize("NFD", s)
        if unicodedata.category(c) != "Mn" and c in _ASCII_KEEP
    )


def cap_feature(s: str) -> int:
    """Capitalization class (reference loader.py:113-128).

    0 = all lowercase, 1 = all caps, 2 = first letter capitalized,
    3 = capital somewhere not first.
    """
    if s.lower() == s:
        return 0
    elif s.upper() == s:
        return 1
    elif s[0].upper() == s[0]:
        return 2
    else:
        return 3
