"""Multi-process / multi-host execution: share-nothing expert partitioning.

The reference scales out via independent SLURM array jobs that share nothing
(reference: submit_gpsat.sh:1-33, IS2_SM_GP/run_days_in_month_IS2_SMAP.sbatch)
and relies on the results store's resume semantics for restart safety. This
module keeps those share-nothing semantics but moves the partitioning
in-process so one driver script runs unchanged on a laptop, a SLURM array, or
a multi-host TPU pod slice:

- every process computes a deterministic strided stripe of the expert grid
  (`partition_experts`), writes to its own rank-namespaced store
  (`rank_store_path`) — no cross-process locking, HDF5 stays single-writer;
- `merge_result_stores` concatenates the per-rank stores into the single
  results file the post-processing / plotting stack expects;
- `init_distributed` wires `jax.distributed.initialize` for real pod slices
  (per-host controller + ICI-connected chips); rank discovery falls back to
  scheduler environment variables so plain CPU/SLURM runs need no
  coordinator at all (there are no collectives in the sweep — experts are
  independent, SURVEY.md §2.4).

CLI:  python -m gpsat_tpu.parallel.multihost merge OUT IN1 IN2 [...]
"""

import os

import numpy as np

__all__ = ["init_distributed", "process_info", "partition_experts",
           "rank_store_path", "merge_result_stores"]


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None):
    """Initialise `jax.distributed` for a multi-host run.

    Safe to call unconditionally: a no-op when already initialised or when
    the environment describes a single process. Arguments default to JAX's
    own cluster auto-detection (TPU pod metadata, SLURM, Open MPI).
    """
    import jax
    if getattr(jax._src.distributed.global_state, "client", None) is not None:
        return  # already initialised
    if num_processes is None and coordinator_address is None \
            and process_info()[1] == 1 and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return  # single process, nothing to do
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def process_info():
    """(rank, world) for the current process.

    Order of precedence: an initialised `jax.distributed` runtime; explicit
    GPSAT_PROCESS_ID / GPSAT_NUM_PROCESSES; SLURM_PROCID / SLURM_NTASKS
    (the reference's array-job environment); single-process default.
    """
    try:
        import jax
        if getattr(jax._src.distributed.global_state, "client", None) \
                is not None:
            return jax.process_index(), jax.process_count()
    except Exception:  # pragma: no cover
        pass
    for rk, wk in (("GPSAT_PROCESS_ID", "GPSAT_NUM_PROCESSES"),
                   ("SLURM_PROCID", "SLURM_NTASKS")):
        if wk in os.environ and int(os.environ[wk]) > 1:
            return int(os.environ.get(rk, 0)), int(os.environ[wk])
    return 0, 1


def partition_experts(df, rank, world):
    """Deterministic strided stripe of the expert-location DataFrame.

    Strided (rank::world) rather than contiguous blocks: expert cost
    correlates with spatial position (data density), and striding balances
    the stripes without needing cost estimates.
    """
    if world <= 1:
        return df
    return df.iloc[int(rank)::int(world)]


def rank_store_path(path, rank, world):
    """Per-rank store path: results.h5 -> results.r003of008.h5."""
    if world <= 1:
        return path
    root, ext = os.path.splitext(path)
    return f"{root}.r{int(rank):03d}of{int(world):03d}{ext}"


def rank_store_paths(path, world):
    return [rank_store_path(path, r, world) for r in range(world)]


def merge_result_stores(in_paths, out_path, verbose=False):
    """Concatenate per-rank result stores into one.

    Row tables (preds, run_details, expert_locs, hyperparameter tables, and
    their *_SMOOTHED variants) are appended in rank order with their
    multi-indexes preserved; `oi_config*` provenance tables are copied from
    the first store that has them (every rank stored the identical config —
    the rank path never enters the stored config).
    """
    from gpsat_tpu.store import ResultsStore

    tables = []
    for p in in_paths:
        with ResultsStore(p, mode="r") as store:
            for t in store.keys():
                if t not in tables:
                    tables.append(t)

    with ResultsStore(out_path, mode="a") as out:
        for t in tables:
            if t.startswith("oi_config"):
                for p in in_paths:
                    with ResultsStore(p, mode="r") as store:
                        if store.has_table(t):
                            df = store.get(t)
                            out.put(t, df, attrs=store.attrs(t))
                            break
                continue
            for p in in_paths:
                with ResultsStore(p, mode="r") as store:
                    if not store.has_table(t):
                        continue
                    df = store.select(t)
                    out.append(t, df)
            if verbose:  # pragma: no cover
                print(f"merged table {t}: {out.nrows(t)} rows")
    return out_path


def _main(argv):  # pragma: no cover - thin CLI
    if len(argv) >= 4 and argv[1] == "merge":
        merge_result_stores(argv[3:], argv[2], verbose=True)
        print(f"merged {len(argv) - 3} stores -> {argv[2]}")
        return 0
    print(__doc__)
    return 1


if __name__ == "__main__":  # pragma: no cover
    import sys
    raise SystemExit(_main(sys.argv))
