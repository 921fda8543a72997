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


def _register_pickle_by_value() -> None:
    """Ship this package's code by value inside Ray task/actor pickles.

    The repo is not pip-installed; workers spawned by a driver running from a
    different cwd cannot import ``ner_pytorch_ray`` by name. Registering every
    submodule with cloudpickle's by-value mode makes UDFs self-contained —
    the same mechanism that lets ``__main__`` functions work — at a few KB of
    extra serialization per task, paid once per stage.
    """
    import importlib
    import pkgutil
    import sys

    try:
        from ray import cloudpickle
    except Exception:  # pragma: no cover
        import cloudpickle  # type: ignore

    pkg = sys.modules[__name__]
    for info in pkgutil.walk_packages(pkg.__path__, prefix=__name__ + "."):
        try:
            mod = importlib.import_module(info.name)
            cloudpickle.register_pickle_by_value(mod)
        except Exception:
            pass
    try:
        cloudpickle.register_pickle_by_value(pkg)
    except Exception:
        pass


_register_pickle_by_value()
