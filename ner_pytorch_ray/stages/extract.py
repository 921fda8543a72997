"""Extract stage: html -> text with the per-row byte-identity invariant.

SURVEY.md §7.2 step 1. Stateless ``map_batches`` over Arrow batches; the
``html`` column (potentially MBs per row at real scale) is dropped
immediately after the check so downstream blocks stay narrow
(SURVEY.md §7.4 "very wide rows").

Invariant (BASELINE.json input_hint): ``extract_text(html) == text``
byte-identical per url. Violations either raise (default) or are counted and
filtered out (``on_mismatch="drop"``) so a 100 TB run doesn't die on one
corrupt page — the count surfaces in the stage's lineage counters.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ner_pytorch_ray.functions.html import extract_text


class ExtractError(ValueError):
    pass


def _make_extract_fn(on_mismatch: str):
    def _extract(batch: pa.Table) -> pa.Table:
        htmls = batch.column("html")
        texts = batch.column("text")
        extracted: list[str] = []
        keep = []
        n_bad = 0
        for i in range(len(batch)):
            h = htmls[i].as_py()
            t = texts[i].as_py()
            e = extract_text(h)
            if e != t:
                if on_mismatch == "raise":
                    url = batch.column("url")[i].as_py()
                    raise ExtractError(
                        f"extract(html) != text for url={url!r} "
                        f"(extracted {len(e)}B vs expected {len(t)}B)"
                    )
                n_bad += 1
                keep.append(False)
            else:
                extracted.append(e)
                keep.append(True)
        out = batch.drop_columns(["html"])
        if n_bad:
            out = out.filter(pa.array(keep))
        # re-emit text from the extractor (not the input column) so downstream
        # provably consumes extracted bytes
        out = out.set_column(
            out.schema.get_field_index("text"),
            "text",
            pa.array(extracted, type=pa.large_string()),
        )
        return out

    return _extract


def extract_stage(
    ds: ray.data.Dataset, on_mismatch: str = "raise"
) -> ray.data.Dataset:
    """html -> extracted text; drops the wide ``html`` column."""
    assert on_mismatch in ("raise", "drop")
    return ds.map_batches(_make_extract_fn(on_mismatch), batch_format="pyarrow")
