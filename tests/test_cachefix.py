"""Compile-cache-key stability: Mosaic payloads must not embed source locations.

Round-3 postmortem: a comment-level edit to ops/lbfgs.py changed the
persistent compile-cache key of the (semantically identical) L-BFGS pool
program and cold-started the driver bench into a ~13-minute remote Mosaic
compile. Root cause: the Pallas kernel module is serialized into the
tpu_custom_call backend_config WITH MLIR location info (callsite chains
through user source), which jax's outer strip-debuginfo canonicalisation
cannot reach. gpsat_tpu._cachefix strips it at serialization time.

Full-program proof (needs the TPU backend): tpu_stuff/cache_key_probe.py —
the canonicalised computation-key hash of a pool program containing the
fused Pallas vg kernel is bit-identical across line-shift edits of
ops/pallas_gpr.py and ops/lbfgs.py (verified 2026-08-21: 96048 bytes of
location-bearing IR -> 79472 location-free, hash stable).
"""

import pytest

jax = pytest.importorskip("jax")
import gpsat_tpu  # noqa: E402,F401  (installs the cachefix patch)


def _mk_module(src):
    from jax._src.interpreters import mlir as jmlir
    from jaxlib.mlir import ir

    ctx = jmlir.make_ir_context()
    ctx.allow_unregistered_dialects = True
    with ctx:
        return ir.Module.parse(src)


_SRC_A = ('module { func.func @f(%a: i32) -> i32 '
          '{ return %a : i32 loc("x.py":3:4) } loc("x.py":1:2) }')
_SRC_B = ('module { func.func @f(%a: i32) -> i32 '
          '{ return %a : i32 loc("y.py":9:9) } loc("y.py":7:8) }')


def test_cachefix_installed():
    import gpsat_tpu._cachefix as cf
    from jax._src import tpu_custom_call as tcc

    assert cf._installed, "mosaic strip-debuginfo patch failed to install"
    assert hasattr(tcc._lower_mosaic_module_to_asm, "_gpsat_orig")


def test_mosaic_asm_location_invariant():
    """Identical programs at different source locations serialize identically."""
    from jax._src import tpu_custom_call as tcc

    asm_a, _ = tcc._lower_mosaic_module_to_asm(_mk_module(_SRC_A))
    asm_b, _ = tcc._lower_mosaic_module_to_asm(_mk_module(_SRC_B))
    assert asm_a == asm_b


def test_unpatched_serializer_is_location_sensitive():
    """Sensitivity check: without the patch the same two modules differ —
    proves the invariance above is the patch's doing, not a vacuous test."""
    from jax._src import tpu_custom_call as tcc

    orig = tcc._lower_mosaic_module_to_asm._gpsat_orig
    asm_a, _ = orig(_mk_module(_SRC_A))
    asm_b, _ = orig(_mk_module(_SRC_B))
    assert asm_a != asm_b
