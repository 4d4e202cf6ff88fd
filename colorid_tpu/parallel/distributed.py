"""Multi-host initialization (the reference's rayon global thread pool maps
to a jax.distributed process group over ICI/DCN — SURVEY §2 table).

Usage on each host of a multi-host TPU slice (or CPU test fleet):

    from colorid_tpu.parallel import distributed
    distributed.initialize()              # env-driven (TPU pods autodetect)
    # or explicitly:
    distributed.initialize("host0:1234", num_processes=2, process_id=i)

after which jax.devices() spans all hosts and parallel.sharded /
parallel.engine lay shards across the whole slice.
"""

from __future__ import annotations


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_multi_process() -> bool:
    import jax

    return jax.process_count() > 1
