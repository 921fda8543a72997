"""ner_pytorch_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the data-processing capabilities of the
reference NER-pytorch repo (msps9341012/NER-pytorch) as an idiomatic Ray Data
pipeline over Arrow batches:

    read_parquet(pages) -> extract/normalize -> sentences -> encode
        -> tagger (actor pool, BiLSTM-CRF Viterbi or gazetteer)
        -> mentions -> linker (alias + cosine) -> relations
        -> canonicalize (salted groupby) -> edges/nodes parquet

plus the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing).

Nothing in this package calls ``ray.init()`` — sessions are owned by the
caller (bench.py, the test fixture, or the driver).
"""

__version__ = "0.1.0"
