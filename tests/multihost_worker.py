"""Subprocess entry for the 2-process jax.distributed test: one "host" of a
multi-host pileup run (tests/test_multihost.py launches two of these).

Each process initializes the distributed runtime, builds a loci mesh over its
LOCAL devices, runs the SAME pileup() — the engine's multihost branch routes
each process its share of region pairs (parallel/distributed.py
local_region_pairs) and merges per-region outputs over the collective
(allreduce_region_maps) — and process 0 dumps the result for comparison
against the single-process table."""

import os
import sys


def main():
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    cool_path = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from coolpuppy_tpu.parallel.distributed import init_distributed

    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=proc_id,
    )
    assert jax.process_count() == 2

    import numpy as np

    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import toy_features, toy_regions

    from coolpuppy_tpu import Cooler, pileup

    clr = Cooler(cool_path)
    table = pileup(
        clr,
        toy_features(),
        features_format="bed",
        view_df=toy_regions(),
        flank=3_000_000,
        mindist=0,
        nshifts=1,
        seed=0,
        by_strand=True,
        mesh="auto",
    )
    if proc_id == 0:
        rows = table.set_index("orientation")
        np.savez(
            out_path,
            orientations=np.asarray(list(rows.index), dtype=object),
            n=np.asarray([rows.loc[o, "n"] for o in rows.index]),
            data=np.stack([rows.loc[o, "data"] for o in rows.index]),
        )


if __name__ == "__main__":
    main()
