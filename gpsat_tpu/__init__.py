"""gpsat_tpu — a TPU-native local-expert Gaussian-process optimal-interpolation engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of GPSat
(reference: /root/reference, akpetty/GPSat): thousands of independent local GP
experts trained and predicted as *batched, vmapped, sharded* device computations
instead of a sequential per-expert Python loop
(reference loop: GPSat/local_experts.py:930).

Layout
------
- ``gpsat_tpu.ops``       : batched masked GP math (kernels, exact GPR, SGPR,
                            SVGP, VFF), bijectors, batched L-BFGS.
- ``gpsat_tpu.models``    : the model zoo with the reference's per-expert API
                            (predict / optimise_parameters / get_* / set_*).
- ``gpsat_tpu.parallel``  : device mesh utilities + sharded expert scheduling.
- ``gpsat_tpu.dataloader``: host-side tabular IO & query (pandas + h5py).
- ``gpsat_tpu.store``     : HDF5 results store (h5py-backed table format).
- ``gpsat_tpu.local_experts``: the experiment engine (batched scheduler).
- ``gpsat_tpu.postprocessing``: hyperparameter smoothing + prediction gluing.
"""

import os

# GP numerics want float64 available (GPflow-style default); hot TPU paths pass
# float32 arrays explicitly. Must happen before jax initialises its backends.
os.environ.setdefault("JAX_ENABLE_X64", "1")
import jax  # noqa: E402

if not jax.config.jax_enable_x64:  # pragma: no cover - depends on env ordering
    jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the batched L-BFGS programs are expensive
# to compile (~1-2 min each) but fully shape-keyed — cache them across runs.
_cache_dir = os.environ.get(
    "GPSAT_TPU_JAX_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "gpsat_tpu_jax"))


def _restore_cache_snapshot(cache_dir):
    """Re-image insurance: build hosts are periodically wiped back to the base
    image, which destroys ~/.cache but preserves committed repo state. A cold
    cache costs ~16 min of remote Mosaic compiles before the bench programs
    run warm, which is longer than the bench driver's kill timeout. If the
    cache dir is missing/empty and a committed snapshot tarball exists
    (created by ``python tpu_stuff/snapshot_cache.py``), unpack it first.
    Stale entries are harmless — unmatched keys are simply never read."""
    snap = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "cache_snapshot", "gpsat_tpu_jax.tar.xz")
    if not os.path.isfile(snap):
        return
    try:
        if os.path.isdir(cache_dir) and os.listdir(cache_dir):
            return  # live cache present; never clobber newer entries
        import tarfile
        os.makedirs(cache_dir, exist_ok=True)
        with tarfile.open(snap, "r:xz") as tf:
            try:
                tf.extractall(cache_dir, filter="data")
            except TypeError:  # pragma: no cover - older tarfile, no filter=
                tf.extractall(cache_dir)
    except Exception:  # pragma: no cover - insurance must never break import
        pass


if _cache_dir and _cache_dir != "0":
    _restore_cache_snapshot(_cache_dir)
    try:  # pragma: no cover - depends on jax version/backend
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

# Strip source-location debuginfo from serialized Mosaic kernel payloads so
# comment/line-shift edits cannot cold-start the persistent compile cache
# (round-3 postmortem; see _cachefix.py and tpu_stuff/cache_key_probe.py).
from . import _cachefix  # noqa: E402

_cachefix.install()

__version__ = "0.1.0"

_PACKAGE_DIR = os.path.dirname(os.path.abspath(__file__))
_PARENT_DIR = os.path.dirname(_PACKAGE_DIR)


def get_path(*sub_dir):
    """Path inside the package directory (reference: GPSat/__init__.py:13)."""
    return os.path.join(_PACKAGE_DIR, *sub_dir)


def get_parent_path(*sub_dir):
    """Path inside the repository root (reference: GPSat/__init__.py:16)."""
    return os.path.join(_PARENT_DIR, *sub_dir)


def get_data_path(*sub_dir):
    """Path inside <repo>/data (reference: GPSat/__init__.py:19)."""
    return os.path.join(_PARENT_DIR, "data", *sub_dir)


def get_config_path(*sub_dir):
    """Path inside <repo>/configs (reference: GPSat/__init__.py:22)."""
    return os.path.join(_PARENT_DIR, "configs", *sub_dir)
