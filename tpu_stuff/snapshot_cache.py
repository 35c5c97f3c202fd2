"""Snapshot the persistent XLA/Mosaic compile cache into the repo.

The build hosts are periodically re-imaged: ~/.cache is destroyed but
committed repo state survives. A cold cache costs ~16 min of remote Mosaic
compiles (gpr 408 s + sweep10k 445 s + sgpr 116 s measured round 5), which is
longer than the bench driver's ~590 s kill window — i.e. a wipe between the
last prewarm and the driver's bench run silently loses the round's numbers.

``gpsat_tpu/__init__._restore_cache_snapshot`` auto-unpacks
``cache_snapshot/gpsat_tpu_jax.tar.xz`` whenever the live cache dir is
missing or empty. This script creates/refreshes that tarball — run it after
``python bench.py prewarm`` reports warm, then commit the tarball.

Usage: python tpu_stuff/snapshot_cache.py [--max-mb 200]
"""

import argparse
import os
import sys
import tarfile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-mb", type=float, default=200.0,
                    help="refuse to write a tarball larger than this")
    ap.add_argument("--cache-dir", default=os.environ.get(
        "GPSAT_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "gpsat_tpu_jax")))
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "cache_snapshot")
    out = os.path.join(out_dir, "gpsat_tpu_jax.tar.xz")

    if not os.path.isdir(args.cache_dir) or not os.listdir(args.cache_dir):
        print(f"cache dir {args.cache_dir} missing/empty — nothing to snapshot")
        return 1

    os.makedirs(out_dir, exist_ok=True)
    tmp = out + ".tmp"
    n = 0
    with tarfile.open(tmp, "w:xz") as tf:
        for name in sorted(os.listdir(args.cache_dir)):
            path = os.path.join(args.cache_dir, name)
            if os.path.isfile(path):
                tf.add(path, arcname=name)
                n += 1
    size_mb = os.path.getsize(tmp) / 1e6
    if size_mb > args.max_mb:
        os.remove(tmp)
        print(f"snapshot would be {size_mb:.1f} MB > --max-mb {args.max_mb}; "
              f"refusing (raise the cap to force)")
        return 1
    os.replace(tmp, out)
    print(f"wrote {out}: {n} entries, {size_mb:.1f} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
