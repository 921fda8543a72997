"""Entity resolution: token blocking + verify + transitive closure.

Reference analogue: the linker's alias canonicalization collapses
surfaces onto one entity (word_rep.py Word_Replacement); here the
clusters are derived from the records themselves.
"""

import pyarrow as pa
import pytest


def _records(rows, blocks=4):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "rid": pa.array([r[0] for r in rows], type=pa.int64()),
                "name": pa.array([r[1] for r in rows], type=pa.string()),
                "grp": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
    ).repartition(blocks)


def _ref_resolve(rows, min_shared=1):
    # sequential oracle: pairwise match + union-find
    parent = {r[0]: r[0] for r in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, (ia, na, ga) in enumerate(rows):
        for ib, nb, gb in rows[i + 1 :]:
            if ga == gb and len(set(na.split()) & set(nb.split())) >= min_shared:
                ra, rb = find(ia), find(ib)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {r[0]: find(r[0]) for r in rows}


ROWS = [
    (1, "small ring", 0),
    (2, "small bolt", 0),
    (3, "red bolt", 0),      # chains to 1 via 2: transitive closure
    (4, "red bolt", 1),      # same name, different grp: separate entity
    (5, "blue gear", 0),     # singleton (no shared token in grp 0)
    (6, "blue gear", 1),
    (7, "gear blue", 1),     # token-set equal, order differs
    (8, "lone widget", 2),   # singleton block of 1
]


class TestEntityResolution:
    def test_matches_union_find_oracle(self):
        from ner_pytorch_ray.pipelines.entity_resolution import resolve_records

        got = {
            r["rid"]: r["entity_id"]
            for r in resolve_records(
                _records(ROWS), "rid", "name", attr_cols=["grp"]
            ).take_all()
        }
        assert got == _ref_resolve(ROWS)
        # the semantics the fixture encodes, spelled out:
        assert got[1] == got[2] == got[3] == 1  # transitive chain
        assert got[4] == 4  # grp attribute separates equal names
        assert got[6] == got[7] == 6  # token-order independent
        assert got[5] == 5 and got[8] == 8  # singletons covered

    def test_block_count_invariance(self):
        from ner_pytorch_ray.pipelines.entity_resolution import resolve_records

        rows = [
            (i, f"w{i % 7} w{(i * 3) % 11}", i % 3) for i in range(120)
        ]
        outs = []
        for blocks in (1, 4, 32):
            got = {
                r["rid"]: r["entity_id"]
                for r in resolve_records(
                    _records(rows, blocks), "rid", "name", attr_cols=["grp"]
                ).take_all()
            }
            outs.append(got)
        assert outs[0] == outs[1] == outs[2] == _ref_resolve(rows)

    def test_min_shared_two_tokens(self):
        from ner_pytorch_ray.pipelines.entity_resolution import resolve_records

        rows = [
            (1, "alpha beta gamma", 0),
            (2, "alpha beta delta", 0),  # shares 2 tokens with 1 -> match
            (3, "alpha zeta eta", 0),    # shares only 1 -> no match
        ]
        got = {
            r["rid"]: r["entity_id"]
            for r in resolve_records(
                _records(rows), "rid", "name", attr_cols=["grp"], min_shared=2
            ).take_all()
        }
        assert got == _ref_resolve(rows, min_shared=2) == {1: 1, 2: 1, 3: 3}

    def test_hot_block_raises(self):
        from ner_pytorch_ray.pipelines.entity_resolution import resolve_records

        rows = [(i, "hot tok%d" % i, 0) for i in range(20)]
        with pytest.raises(Exception, match="max_block"):
            resolve_records(
                _records(rows), "rid", "name", attr_cols=["grp"], max_block=10
            ).materialize()

    def test_repeated_token_single_evidence(self):
        from ner_pytorch_ray.pipelines.entity_resolution import (
            blocked_match_pairs,
        )

        # "ring ring" must contribute ONE evidence unit to (1,2), so at
        # min_shared=2 the pair is rejected
        rows = [(1, "ring ring", 0), (2, "ring band", 0)]
        pairs = blocked_match_pairs(
            _records(rows), "rid", "name", attr_cols=["grp"], min_shared=2
        ).take_all()
        assert pairs == []
