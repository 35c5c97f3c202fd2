"""Prove (and then disprove) compile-cache-key sensitivity to source edits.

Round-3 postmortem (VERDICT.md): a comment-level edit to ops/lbfgs.py
cold-started the driver bench into a ~13-minute remote Mosaic compile —
the persistent compilation cache held SIX distinct ~29 MB copies of the
same pool program. jax's own key canonicalisation
(jax._src.cache_key._canonicalize_ir) strips debuginfo from the OUTER
stablehlo module (jax_compilation_cache_include_metadata_in_key defaults
to False), but a Pallas kernel rides inside `tpu_custom_call` as
serialized Mosaic MLIR bytecode in the backend_config STRING — and those
bytes keep every op's location, including callsite chains through user
code. Any line-shift in a file on the trace path changes the payload and
hence the key.

This probe computes the exact bytes jax hashes for the cache key
("computation" entry) for a program containing our fused Pallas vg
kernel, WITHOUT any remote compile (lowering is host-local):

    python tpu_stuff/cache_key_probe.py            # prints sha256 of key bytes

Run it, append a comment line to the TOP of ops/pallas_gpr.py and
ops/lbfgs.py (shifting all line numbers), run again, compare hashes.

Before the fix in gpsat_tpu/_cachefix.py: hashes DIFFER (leak).
After: hashes MATCH; set GPSAT_STRIP_MOSAIC_DEBUG=0 to see the leak again.
"""

import hashlib
import sys

import numpy as np

import gpsat_tpu  # noqa: F401  (installs the cache fix + x64)
import jax
import jax.numpy as jnp


def computation_key_bytes(lowered):
    """The canonicalised-IR bytes jax hashes into the cache key."""
    from jax._src import cache_key
    module = lowered._lowering.stablehlo()
    return cache_key._canonicalize_ir(module, cache_key.IgnoreCallbacks.NO)


def main(platform=None):
    if platform:
        jax.config.update("jax_platforms", platform)
    dev = jax.devices()[0]
    print(f"platform={dev.platform}", file=sys.stderr)

    from gpsat_tpu.ops.pallas_gpr import nlml_vg_batched, pallas_vg_supported

    N, D, B = 400, 3, 8
    assert pallas_vg_supported("Matern32", D, N), "probe shape unsupported"
    X = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (B, N, D)),
                    dtype=jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).normal(size=(B, N)),
                    dtype=jnp.float32)
    maskf = jnp.ones((B, N), dtype=jnp.float32)
    params = {"lengthscales": jnp.ones((B, D), jnp.float32),
              "kernel_variance": jnp.ones((B,), jnp.float32),
              "likelihood_variance": jnp.full((B,), 0.1, jnp.float32)}

    fn = jax.jit(lambda p, X, y, m: nlml_vg_batched(
        p, X, y, m, kernel="Matern32", jitter=1e-6))
    lowered = fn.lower(params, X, y, maskf)
    ir_bytes = computation_key_bytes(lowered)
    digest = hashlib.sha256(ir_bytes).hexdigest()
    n_loc = ir_bytes.count(b"pallas_gpr.py")
    n_lbfgs = ir_bytes.count(b"lbfgs.py")
    print(f"canonical-IR bytes: {len(ir_bytes)}  "
          f"mentions pallas_gpr.py x{n_loc}, lbfgs.py x{n_lbfgs}")
    print(f"computation-key sha256: {digest}")


if __name__ == "__main__":
    main(platform=sys.argv[1] if len(sys.argv) > 1 else None)
