"""Make persistent-compile-cache keys insensitive to source line-shifts.

Round-3 postmortem (VERDICT.md "What's missing" #1): the driver-time bench
cold-started into a ~13-minute remote Mosaic compile because a comment-level
edit to ops/lbfgs.py changed the compiled-program cache key — the persistent
cache accumulated six distinct ~29 MB copies of the identical pool program
over one night of edits.

Root cause (proved by tpu_stuff/cache_key_probe.py): jax's cache-key
canonicalisation strips debuginfo from the OUTER stablehlo module
(jax_compilation_cache_include_metadata_in_key=False is the default), but a
Pallas kernel rides inside the `tpu_custom_call` op as serialized Mosaic MLIR
bytecode in the backend_config string. Those bytes keep every kernel op's
location — including callsite chains through user code — so any line-shift
in a file on the kernel's trace path changes the payload bytes and hence the
key, even though the program is semantically identical.

Fix: run MLIR's `strip-debuginfo` pass on the Mosaic kernel module just
before jax serializes it (jax._src.tpu_custom_call._lower_mosaic_module_to_asm).
Locations in the kernel module are only used for Mosaic compiler diagnostics;
stripping them costs error-message quality (set GPSAT_STRIP_MOSAIC_DEBUG=0
while debugging a kernel) and buys bit-identical payloads across edits.

Verified by the probe: with the patch, the computation-key hash is unchanged
by line-shifts in ops/pallas_gpr.py / ops/lbfgs.py; without it, any shift
changes the hash. tests/test_cachefix.py pins both directions on CPU-lowered
IR equivalents where possible and the patch's defensive fallback.
"""

import logging
import os

logger = logging.getLogger(__name__)

_installed = False


def install():
    """Idempotently patch Mosaic module serialization to strip debuginfo."""
    global _installed
    if _installed or os.environ.get("GPSAT_STRIP_MOSAIC_DEBUG", "1") == "0":
        return
    try:
        from typing import cast as _cast

        from jax._src import tpu_custom_call as _tcc
        from jaxlib.mlir import ir as _ir
        from jaxlib.mlir.passmanager import PassManager as _PM

        _orig = _tcc._lower_mosaic_module_to_asm

        def _stripped_lower(module, *, ir_version=None):
            try:
                with module.context:
                    clone = _cast(_ir.Module, module.operation.clone())
                    _PM.parse("builtin.module(strip-debuginfo)").run(
                        clone.operation)
                    module = clone
            except Exception:  # pragma: no cover - mlir API drift
                logger.warning("mosaic strip-debuginfo failed; cache keys "
                               "will be source-location sensitive",
                               exc_info=True)
            return _orig(module, ir_version=ir_version)

        _stripped_lower._gpsat_orig = _orig
        _tcc._lower_mosaic_module_to_asm = _stripped_lower
        _installed = True
    except Exception:  # pragma: no cover - jax internals moved
        logger.warning("mosaic cache fix not installed (jax internals "
                       "changed?); cache keys will be source-location "
                       "sensitive", exc_info=True)
