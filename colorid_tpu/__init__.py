"""colorid-tpu: a TPU-native BIGSI engine for taxonomic identification.

Public API:

    from colorid_tpu import BigsiIndex, QueryEngine, build_index

    index = build_index({"acc": ["genome.fasta"]}, 50_000_000, 4, 31)
    index.save("panel.bxi")
    engine = QueryEngine(BigsiIndex.load("panel.bxi"))
    result = engine.search_keys(keys, qcounts=counts)

CLI: ``python -m colorid_tpu.cli {build,search,info,read_id,batch_id,read_filter}``.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: importing the package must not pull jax into light-weight users
    if name == "BigsiIndex":
        from .index.bigsi import BigsiIndex

        return BigsiIndex
    if name == "QueryEngine":
        from .engine import QueryEngine

        return QueryEngine
    if name == "ShardedQueryEngine":
        from .parallel.engine import ShardedQueryEngine

        return ShardedQueryEngine
    if name == "build_index":
        from .pipelines.build import build_index

        return build_index
    raise AttributeError(name)
