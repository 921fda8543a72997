"""N-Triples sink/source for the constructed knowledge graph.

The north-star graph materialization is partitioned Parquet
(pipelines/kg.write_graph); this module adds the interchange format KG
consumers actually ingest — W3C N-Triples (one `<s> <p> <o> .` line per
triple) — as a proper Ray ``Datasink``:

- one ``part-{task_idx:06d}.nt`` file per write task (resumable layout:
  a partial job leaves complete part files; re-running overwrites by
  task index, never appends),
- a ``_MANIFEST.json`` committed only in ``on_write_complete`` with
  per-part line counts and the total — the per-partition lineage +
  counters contract every other sink in this engine follows
  (pipelines/resumable.py, state/manifests.py),
- a vectorized reader (``read_ntriples``) built on ``ray.data.read_text``
  so the round trip is itself a streaming Dataset pipeline.

Entity/predicate ids become IRIs under fixed namespaces
(``urn:ent:``/``urn:rel:``) with percent-escaping of the characters
N-Triples cannot carry raw; escaping is bijective, so read(write(x)) == x
byte-for-byte (tested in tests/test_ntriples.py).
"""

from __future__ import annotations

import json
import os
from typing import Iterable

import pyarrow as pa

import ray.data
from ray.data.datasource import Datasink

ENT_NS = "urn:ent:"
REL_NS = "urn:rel:"

# characters that may not appear raw inside an IRIREF (N-Triples grammar:
# no control chars, space, or <>"{}|^` and backslash); '%' must be escaped
# too so unescaping is unambiguous.
_ESCAPE = set(' <>"{}|^`\\%') | {chr(c) for c in range(0x21)}


def _iri_escape(s: str) -> str:
    if not any(c in _ESCAPE for c in s):
        return s
    return "".join(
        "".join("%" + format(b, "02X") for b in c.encode("utf-8"))
        if c in _ESCAPE
        else c
        for c in s
    )


def _iri_unescape(s: str) -> str:
    if "%" not in s:
        return s
    out = bytearray()
    i = 0
    bs = s.encode("utf-8")
    while i < len(bs):
        if bs[i : i + 1] == b"%":
            out.append(int(bs[i + 1 : i + 3], 16))
            i += 3
        else:
            out.append(bs[i])
            i += 1
    return out.decode("utf-8")


def triples_to_lines(batch: pa.Table) -> list[str]:
    """Vectorized-enough formatter: (subj, pred, obj) -> N-Triples lines.
    String assembly is a per-row join over already-decoded columns — the
    format itself is line-oriented, there is no columnar shortcut."""
    subs = batch.column("subj").to_pylist()
    preds = batch.column("pred").to_pylist()
    objs = batch.column("obj").to_pylist()
    return [
        f"<{ENT_NS}{_iri_escape(s)}> <{REL_NS}{_iri_escape(p)}> "
        f"<{ENT_NS}{_iri_escape(o)}> ."
        for s, p, o in zip(subs, preds, objs)
    ]


class NTriplesDatasink(Datasink):
    """Writes one ``part-{task_idx:06d}.nt`` per write task plus a
    ``_MANIFEST.json`` committed only after ALL tasks succeed — a crashed
    job leaves no manifest, so readers (and resume logic) can distinguish
    a complete export from a partial one at a glance."""

    def __init__(self, path: str):
        self._path = path

    def on_write_start(self) -> None:
        os.makedirs(self._path, exist_ok=True)
        # a re-run must not resurrect a stale manifest OR stale part files
        # from a prior (possibly larger) job — same stale-shard-dir guard
        # as the checkpointed readers (pipelines/resumable.py)
        m = os.path.join(self._path, "_MANIFEST.json")
        if os.path.exists(m):
            os.remove(m)
        for f in os.listdir(self._path):
            if f.endswith(".nt") or f.endswith(".tmp"):
                os.remove(os.path.join(self._path, f))

    def write(self, blocks: Iterable, ctx) -> dict:
        lines: list[str] = []
        for block in blocks:
            if not isinstance(block, pa.Table):
                block = pa.Table.from_pandas(block)
            if len(block):
                lines.extend(triples_to_lines(block))
        fname = f"part-{ctx.task_idx:06d}.nt"
        tmp = os.path.join(self._path, "." + fname + ".tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            for ln in lines:
                f.write(ln)
                f.write("\n")
        os.replace(tmp, os.path.join(self._path, fname))  # atomic per part
        return {"file": fname, "n_lines": len(lines)}

    def on_write_complete(self, write_result) -> None:
        parts = sorted(write_result.write_returns, key=lambda r: r["file"])
        manifest = {
            "format": "ntriples",
            "parts": parts,
            "n_lines": sum(p["n_lines"] for p in parts),
        }
        tmp = os.path.join(self._path, "._MANIFEST.json.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(self._path, "_MANIFEST.json"))

    @property
    def supports_distributed_writes(self) -> bool:
        # single-node sandbox writes to a local path; on a real cluster
        # point this at shared storage and flip to True
        return False


def write_ntriples(triples: ray.data.Dataset, path: str) -> dict:
    """Export a (subj, pred, obj[, ...]) Dataset as N-Triples; returns the
    committed manifest."""
    triples.select_columns(["subj", "pred", "obj"]).write_datasink(
        NTriplesDatasink(path)
    )
    with open(os.path.join(path, "_MANIFEST.json"), encoding="utf-8") as f:
        return json.load(f)


def _parse_lines(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    subs, preds, objs = [], [], []
    for ln in texts:
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        if not ln.endswith(" ."):
            raise ValueError(f"not an N-Triples line: {ln!r}")
        s, p, o = ln[:-2].split(" ")
        for tok, ns in ((s, ENT_NS), (p, REL_NS), (o, ENT_NS)):
            if not (tok.startswith("<" + ns) and tok.endswith(">")):
                raise ValueError(f"unexpected IRI {tok!r}")
        subs.append(_iri_unescape(s[len(ENT_NS) + 1 : -1]))
        preds.append(_iri_unescape(p[len(REL_NS) + 1 : -1]))
        objs.append(_iri_unescape(o[len(ENT_NS) + 1 : -1]))
    return pa.table(
        {
            "subj": pa.array(subs, type=pa.string()),
            "pred": pa.array(preds, type=pa.string()),
            "obj": pa.array(objs, type=pa.string()),
        }
    )


def read_ntriples(path: str) -> ray.data.Dataset:
    """Stream an N-Triples export back as a (subj, pred, obj) Dataset.
    Refuses exports without a committed manifest (partial jobs)."""
    mpath = os.path.join(path, "_MANIFEST.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"{path} has no _MANIFEST.json — incomplete N-Triples export"
        )
    with open(mpath, encoding="utf-8") as f:
        manifest = json.load(f)
    # read exactly the committed parts — never whatever else the directory
    # happens to contain
    files = [os.path.join(path, p["file"]) for p in manifest["parts"]]
    return ray.data.read_text(files).map_batches(
        _parse_lines, batch_format="pyarrow"
    )
