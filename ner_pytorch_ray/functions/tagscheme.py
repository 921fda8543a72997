"""IOB1/IOB2/IOBES tag-scheme validation and conversion.

Reference semantics (re-implemented, not copied):
  - iob2 (IOB1 -> IOB2 repair): /root/reference/utils.py:77-96
  - iob_iobes: /root/reference/utils.py:99-121
  - iobes_iob: /root/reference/utils.py:124-142
  - update_tag_scheme: /root/reference/loader.py:45-66

All functions are pure: they take and return lists of tag strings and never
mutate their input (the reference mutates in place; we don't, because rows
flow through Arrow batches).
"""

from __future__ import annotations


class InvalidTagSchemeError(ValueError):
    pass


def iob2(tags: list[str]) -> list[str] | None:
    """Validate IOB; repair IOB1 to IOB2. Returns the repaired list, or
    ``None`` when the sequence is not valid IOB (reference returns False).
    """
    out = list(tags)
    for i, tag in enumerate(out):
        if tag == "O":
            continue
        split = tag.split("-")
        if len(split) != 2 or split[0] not in ("I", "B"):
            return None
        if split[0] == "B":
            continue
        elif i == 0 or out[i - 1] == "O":
            out[i] = "B" + tag[1:]
        elif out[i - 1][1:] == tag[1:]:
            continue
        else:
            out[i] = "B" + tag[1:]
    return out


def iob_iobes(tags: list[str]) -> list[str]:
    """Convert IOB2 to IOBES (reference utils.py:99-121)."""
    new_tags: list[str] = []
    n = len(tags)
    for i, tag in enumerate(tags):
        if tag == "O":
            new_tags.append(tag)
            continue
        prefix = tag.split("-")[0]
        nxt_is_i = i + 1 < n and tags[i + 1].split("-")[0] == "I"
        if prefix == "B":
            new_tags.append(tag if nxt_is_i else "S" + tag[1:])
        elif prefix == "I":
            new_tags.append(tag if nxt_is_i else "E" + tag[1:])
        else:
            raise InvalidTagSchemeError(f"Invalid IOB tag: {tag!r}")
    return new_tags


def iobes_iob(tags: list[str]) -> list[str]:
    """Convert IOBES to IOB2 (reference utils.py:124-142)."""
    new_tags: list[str] = []
    for tag in tags:
        prefix = tag.split("-")[0]
        if prefix in ("B", "I", "O"):
            new_tags.append(tag)
        elif prefix == "S":
            new_tags.append("B" + tag[1:])
        elif prefix == "E":
            new_tags.append("I" + tag[1:])
        else:
            raise InvalidTagSchemeError(f"Invalid IOBES tag: {tag!r}")
    return new_tags


def update_tag_scheme(tags: list[str], tag_scheme: str) -> list[str]:
    """Repair to IOB2 then optionally convert to IOBES
    (reference loader.py:45-66, per-sentence)."""
    repaired = iob2(tags)
    if repaired is None:
        raise InvalidTagSchemeError(f"Sentence not in IOB format: {tags!r}")
    if tag_scheme == "iob":
        return repaired
    if tag_scheme == "iobes":
        return iob_iobes(repaired)
    raise InvalidTagSchemeError(f"Unknown tagging scheme: {tag_scheme!r}")
