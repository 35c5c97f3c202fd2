"""Weight-function playground: compare the smoothing/merge weight kernels.

TPU-first equivalent of the reference's weight-function playground
(examples/weight_function_compare.py), which timed its numba
`gaussian_2d_weight` gufunc against an astropy Gaussian2DKernel convolution
on a NaN-holed grid. Here the contenders are:

  1. `postprocessing.gaussian_2d_smooth` — the jitted XLA smoother used by
     `smooth_hyperparameters` (device-accelerated, NaN-aware);
  2. `utils.get_weighted_values` — the pandas groupby Gaussian merge used to
     glue overlapping per-expert predictions;
  3. a direct NumPy oracle (explicit exp(-d^2/2) weighted sum).

All three implement w = exp(-d2/2), d2 = ((x-x0)/l_x)^2 + ((y-y0)/l_y)^2
with NaN sources dropped, so their outputs must agree to float tolerance —
this script asserts that, then reports timings.

Run: python -m examples.weight_function_compare [--n 64] [--plot out.png]
"""

import argparse
import time

import numpy as np
import pandas as pd


def numpy_oracle(x0, y0, x, y, l_x, l_y, vals):
    """Direct O(out*src) NumPy weighted sum; NaN vals dropped."""
    out = np.empty(len(x0))
    ok = ~np.isnan(vals)
    for i in range(len(x0)):
        d2 = ((x - x0[i]) / l_x) ** 2 + ((y - y0[i]) / l_y) ** 2
        w = np.exp(-0.5 * d2) * ok
        s = w.sum()
        out[i] = np.nan if s == 0 else (w * np.where(ok, vals, 0.0)).sum() / s
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=64, help="grid side length")
    p.add_argument("--lengthscale", type=float, default=2.0)
    p.add_argument("--nan-frac", type=float, default=0.15)
    p.add_argument("--plot", default=None, help="optional PNG output path")
    args = p.parse_args(argv)

    from gpsat_tpu.postprocessing import gaussian_2d_smooth
    from gpsat_tpu.utils import get_weighted_values

    rng = np.random.default_rng(0)
    n = args.n
    gx, gy = np.meshgrid(np.arange(n, dtype=float), np.arange(n, dtype=float))
    x, y = gx.ravel(), gy.ravel()
    vals = (np.sin(x / 7.0) * np.cos(y / 9.0)
            + 0.25 * rng.standard_normal(x.shape))
    vals[rng.random(vals.shape) < args.nan_frac] = np.nan  # holes to in-fill
    ls = args.lengthscale

    # 1. device smoother (warm once so the timing excludes compilation)
    gaussian_2d_smooth(x, y, x, y, ls, ls, vals)
    t0 = time.perf_counter()
    smoothed = gaussian_2d_smooth(x, y, x, y, ls, ls, vals)
    t_dev = time.perf_counter() - t0

    # 2. pandas Gaussian merge: every (output, source) pair within 4*ls —
    # the glue path's sparse formulation of the same weighted sum. Restrict
    # the oracle comparison to a subsample so the pair table stays small.
    sub = rng.choice(len(x), size=min(256, len(x)), replace=False)
    pairs = []
    for i in sub:
        d2 = (x - x[i]) ** 2 + (y - y[i]) ** 2
        near = np.where(d2 <= (4 * ls) ** 2)[0]
        pairs.append(pd.DataFrame({
            "px": np.full(len(near), x[i]), "py": np.full(len(near), y[i]),
            "sx": x[near], "sy": y[near], "val": vals[near]}))
    df = pd.concat(pairs, ignore_index=True).dropna(subset=["val"])
    t0 = time.perf_counter()
    merged = get_weighted_values(df, ref_col=["px", "py"],
                                 dist_to_col=["sx", "sy"], val_cols="val",
                                 lengthscale=ls)
    t_merge = time.perf_counter() - t0
    merged = merged.set_index(["px", "py"])["val"]

    # 3. NumPy oracle on the subsample
    t0 = time.perf_counter()
    oracle = numpy_oracle(x[sub], y[sub], x, y, ls, ls, vals)
    t_np = time.perf_counter() - t0

    # agreement: device smoother vs oracle everywhere the oracle is defined
    dev_sub = smoothed[sub]
    err_dev = np.nanmax(np.abs(dev_sub - oracle))
    # the merge only saw sources within 4*ls; a truncated-support oracle
    oracle_trunc = np.array([
        merged.loc[(x[i], y[i])] for i in sub])
    # truncation at 4*ls changes weights by < exp(-8); loose tol covers it
    err_merge = np.nanmax(np.abs(oracle_trunc - oracle))

    print(f"grid {n}x{n}, lengthscale {ls}, {np.isnan(vals).sum()} NaN holes")
    print(f"device smoother : {t_dev * 1e3:8.2f} ms   "
          f"max |err| vs oracle = {err_dev:.2e}")
    print(f"pandas merge    : {t_merge * 1e3:8.2f} ms   "
          f"max |err| vs oracle = {err_merge:.2e} (4-sigma truncated)")
    print(f"numpy oracle    : {t_np * 1e3:8.2f} ms   ({len(sub)} outputs)")
    assert err_dev < 1e-8, "device smoother diverged from the oracle"
    assert err_merge < 1e-3, "pandas merge diverged beyond truncation error"

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 2, figsize=(9, 4))
        for ax, (z, title) in zip(axes, [
                (vals, "input (with NaN holes)"),
                (smoothed, "gaussian_2d_smooth")]):
            im = ax.imshow(z.reshape(n, n), origin="lower")
            ax.set_title(title)
            fig.colorbar(im, ax=ax, shrink=0.8)
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"wrote {args.plot}")
    print("weight_function_compare: OK")


if __name__ == "__main__":
    main()
