"""Expert bucketing: group ragged experts into fixed padded shapes.

Per-expert data counts vary wildly (min_obs=3 up to ~1e5 — SURVEY.md §7
"ragged experts"); to keep XLA programs static-shaped and the compile-cache
small, experts are grouped into buckets keyed by padded (N_obs, N_pred)
levels (powers of two), then batched.
"""

import numpy as np

__all__ = ["bucket_level", "make_buckets", "auto_batch_size"]

_LEVELS = [8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384,
           32768, 65536, 131072]


def bucket_level(n, levels=None):
    """Smallest padded level >= n."""
    levels = _LEVELS if levels is None else levels
    for lv in levels:
        if n <= lv:
            return lv
    return int(n)


def _default_budget_elems():
    """Element budget for the dominant [B, N, N] temporaries.

    The L-BFGS program holds ~a dozen [B, N, N] buffers live (kernel matrix,
    Cholesky factor + its VJP triangular-solve temps, linesearch residuals).
    Accelerators (16 GB HBM on v5e) get a tighter budget than hosts.
    """
    try:
        import jax
        if jax.devices()[0].platform != "cpu":
            return 2**25        # ~134 MB per f32 buffer
    except Exception:
        pass
    return 2**26                # ~512 MB per f64 buffer on host


def auto_batch_size(n_max, p_max=0, budget_elems=None, dtype_bytes=8,
                    max_batch=4096):
    """Batch size bounded by ~budget_elems elements for the dominant [B, N, N]
    kernel matrix."""
    if budget_elems is None:
        budget_elems = _default_budget_elems()
    per_expert = max(n_max * n_max + 2 * n_max * max(p_max, 1), 1)
    b = max(1, int(budget_elems // per_expert))
    return int(min(b, max_batch))


def make_buckets(n_obs, n_pred, batch_size=None, multiple_of=1, levels=None):
    """Group expert indices into batches of identical padded shape.

    Parameters
    ----------
    n_obs, n_pred : [E] int arrays of per-expert valid counts.
    batch_size : fixed batch size per bucket, or None for auto.
    multiple_of : pad batch sizes to a multiple (device count).

    Returns
    -------
    list of dicts: {indices: [b] expert ids, n_max, p_max, batch_pad}
    where batch_pad >= len(indices) is the padded batch dimension.
    """
    n_obs = np.asarray(n_obs)
    n_pred = np.asarray(n_pred)
    keys = {}
    for i in range(len(n_obs)):
        k = (bucket_level(int(n_obs[i]), levels),
             bucket_level(int(n_pred[i]), levels) if n_pred[i] > 0 else 0)
        keys.setdefault(k, []).append(i)

    out = []
    for (n_max, p_max), idxs in sorted(keys.items()):
        bs = batch_size or auto_batch_size(n_max, p_max)
        bs = max(1, bs - bs % multiple_of) if bs >= multiple_of else bs
        for s in range(0, len(idxs), bs):
            chunk = idxs[s:s + bs]
            pad = len(chunk)
            if multiple_of > 1:
                pad = int(-(-pad // multiple_of) * multiple_of)
            # pad to the chosen batch size when it is a full chunk, so the
            # compile cache sees one shape per bucket level
            if len(idxs) > bs:
                pad = bs if len(chunk) == bs else pad
            out.append({"indices": np.asarray(chunk), "n_max": n_max,
                        "p_max": p_max, "batch_pad": pad})
    return out
