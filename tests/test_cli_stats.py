"""conlleval CLI parity and adversarial stage modification stats."""


def test_evaluate_lines_matches_reference_oracle(reference_path):
    """Same numbers as the reference conlleval on a crafted pred file."""
    from ner_pytorch_ray.conlleval_cli import evaluate_lines

    lines = [
        "EU S-ORG S-ORG",
        "rejects O O",
        "German S-MISC O",
        "",
        "Peter B-PER B-PER",
        "Black E-PER E-PER",
        "",
    ]
    m = evaluate_lines(lines)

    # reference oracle: /root/reference/conlleval.py evaluate() (pure module,
    # importable via the session fixture's torch stub + sys.path)
    import conlleval as ref

    true = ["S-ORG", "O", "S-MISC", "B-PER", "E-PER"]
    pred = ["S-ORG", "O", "O", "B-PER", "E-PER"]
    prec, rec, f1 = ref.evaluate(true, pred, verbose=False)
    assert abs(m["precision"] - prec) < 1e-9
    assert abs(m["recall"] - rec) < 1e-9
    assert abs(m["f1"] - f1) < 1e-9


def test_adv_stage_stats(ray_session):
    from ner_pytorch_ray.pipelines.adversarial import adv_stage_stats

    t = adv_stage_stats("/root/testdata/sf0.001", order="rep,ppdb")
    rows = {r["stage"]: r for r in t.to_pylist()}
    assert set(rows) == {"rep", "ppdb"}
    for r in rows.values():
        assert r["n_sources"] > 0
        assert 0 <= r["n_modified_sources"] <= r["n_sources"]
        assert r["n_variants"] >= r["n_modified_sources"]
        assert 0.0 <= r["modification_rate"] <= 1.0
    assert rows["rep"]["n_variants"] > 0


def test_kg_block_size_invariance(ray_session):
    """SURVEY §5 property: block structure never changes the edge multiset."""
    from ner_pytorch_ray.sources.pages import pages_from_documents
    from ner_pytorch_ray.pipelines.kg import linked_mentions
    from ner_pytorch_ray.stages.graph import edges_from_linked

    def run(nb):
        pages = pages_from_documents(
            "/root/testdata/sf0.001", override_num_blocks=nb
        )
        return edges_from_linked(linked_mentions(pages)).take_all()

    assert run(2) == run(17)
