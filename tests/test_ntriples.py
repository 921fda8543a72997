"""N-Triples sink/source round trip (sources/ntriples.py): Datasink part
files + committed manifest, bijective IRI escaping, manifest-gated reads."""

import json
import os

import pyarrow as pa
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


def _triples_table():
    return pa.table(
        {
            "subj": pa.array(
                ["org:spark", "per:a b", 'loc:we"ird', "misc:pct%40"],
                type=pa.string(),
            ),
            "pred": pa.array(
                ["filter", "co occurs", "x<y>", "q`r"], type=pa.string()
            ),
            "obj": pa.array(
                ["loc:table", "org:spark", "per:back\\slash", "loc:ok"],
                type=pa.string(),
            ),
        }
    )


def test_roundtrip_nasty_strings(tmp_path):
    from ner_pytorch_ray.sources.ntriples import (
        read_ntriples,
        write_ntriples,
    )

    t = _triples_table()
    out = str(tmp_path / "nt")
    manifest = write_ntriples(ray.data.from_arrow(t), out)
    assert manifest["n_lines"] == 4
    back = read_ntriples(out).take_all()
    got = sorted((r["subj"], r["pred"], r["obj"]) for r in back)
    ref = sorted(
        zip(
            t.column("subj").to_pylist(),
            t.column("pred").to_pylist(),
            t.column("obj").to_pylist(),
        )
    )
    assert got == ref


def test_kg_edges_roundtrip_and_manifest(tmp_path):
    from ner_pytorch_ray.pipelines.kg import kg_from_documents
    from ner_pytorch_ray.sources.ntriples import (
        read_ntriples,
        write_ntriples,
    )

    edges, _ = kg_from_documents(SF)
    em = edges.materialize()
    out = str(tmp_path / "kgnt")
    manifest = write_ntriples(em, out)
    assert manifest["n_lines"] == em.count()
    # per-part lineage: every part file exists with its counted lines
    for p in manifest["parts"]:
        path = os.path.join(out, p["file"])
        with open(path, encoding="utf-8") as f:
            assert sum(1 for _ in f) == p["n_lines"]
    back = read_ntriples(out).take_all()
    ref = sorted(
        (r["subj"], r["pred"], r["obj"]) for r in em.take_all()
    )
    assert sorted((r["subj"], r["pred"], r["obj"]) for r in back) == ref


def test_read_refuses_partial_export(tmp_path):
    from ner_pytorch_ray.sources.ntriples import (
        read_ntriples,
        write_ntriples,
    )

    out = str(tmp_path / "partial")
    write_ntriples(ray.data.from_arrow(_triples_table()), out)
    os.remove(os.path.join(out, "_MANIFEST.json"))  # simulate a crash
    with pytest.raises(FileNotFoundError, match="incomplete"):
        read_ntriples(out)


def test_rerun_overwrites_stale_manifest(tmp_path):
    from ner_pytorch_ray.sources.ntriples import write_ntriples

    out = str(tmp_path / "rerun")
    m1 = write_ntriples(ray.data.from_arrow(_triples_table()), out)
    # second run over a SMALLER dataset must not inherit the old manifest
    # nor leak the first run's part files into a re-read
    small = pa.table(
        {
            "subj": pa.array(["a"], type=pa.string()),
            "pred": pa.array(["p"], type=pa.string()),
            "obj": pa.array(["b"], type=pa.string()),
        }
    )
    m2 = write_ntriples(ray.data.from_arrow(small), out)
    assert m1["n_lines"] == 4 and m2["n_lines"] == 1
    with open(os.path.join(out, "_MANIFEST.json"), encoding="utf-8") as f:
        assert json.load(f)["n_lines"] == 1

    from ner_pytorch_ray.sources.ntriples import read_ntriples

    back = read_ntriples(out).take_all()
    assert [(r["subj"], r["pred"], r["obj"]) for r in back] == [
        ("a", "p", "b")
    ]
