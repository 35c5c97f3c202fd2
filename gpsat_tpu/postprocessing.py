"""Post-processing: hyperparameter-field smoothing and prediction gluing
(reference: GPSat/postprocessing.py).

The reference smooths each hyperparameter field with an O(E^2) all-pairs
numba gufunc (postprocessing.py:22-52). Here the same Gaussian-weight smoother
runs as one jitted device program (`gaussian_2d_smooth`); E~1e4 experts is a
1e8-pair elementwise+matmul problem — ideal for the TPU's VPU/MXU.
"""

import json
import os
import re
import warnings
from dataclasses import dataclass
from typing import Dict, List, Union

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from gpsat_tpu.local_experts import get_results_from_h5file
from gpsat_tpu.store import ResultsStore
from gpsat_tpu.utils import cprint, json_serializable, get_config_from_sysargv

__all__ = ["SmoothingConfig", "smooth_hyperparameters", "gaussian_2d_smooth",
           "gaussian_2d_smooth_tiled", "glue_local_predictions_1d",
           "glue_local_predictions_2d"]


@jax.jit
def _gaussian_2d_smooth_jit(x0, y0, x, y, l_x, l_y, vals):
    """out[i] = sum_j w_ij * vals[j] / sum_j w_ij,
    w_ij = exp(-(((x_j-x0_i)/l_x)^2 + ((y_j-y0_i)/l_y)^2)/2), NaN vals skipped."""
    dx = (x[None, :] - x0[:, None]) / l_x
    dy = (y[None, :] - y0[:, None]) / l_y
    w = jnp.exp(-0.5 * (dx * dx + dy * dy))
    ok = ~jnp.isnan(vals)
    w = w * ok[None, :]
    v = jnp.where(ok, vals, 0.0)
    w_sum = w.sum(axis=1)
    out = (w @ v) / jnp.where(w_sum == 0, 1.0, w_sum)
    return jnp.where(w_sum == 0, jnp.nan, out)


def gaussian_2d_smooth(x0, y0, x, y, l_x, l_y, vals):
    """Gaussian-kernel smooth of vals at source (x, y) evaluated at (x0, y0)
    (device-accelerated equivalent of reference postprocessing.py:22)."""
    return np.asarray(_gaussian_2d_smooth_jit(
        jnp.asarray(x0, dtype=jnp.float64), jnp.asarray(y0, dtype=jnp.float64),
        jnp.asarray(x, dtype=jnp.float64), jnp.asarray(y, dtype=jnp.float64),
        jnp.asarray(float(l_x)), jnp.asarray(float(l_y)),
        jnp.asarray(vals, dtype=jnp.float64)))


@jax.jit
def _gaussian_2d_smooth_masked_jit(x0, y0, m0, x, y, sm, l_x, l_y, vals):
    """Tile-local smoother: padded outputs (m0) against padded sources (sm)."""
    dx = (x[None, :] - x0[:, None]) / l_x
    dy = (y[None, :] - y0[:, None]) / l_y
    w = jnp.exp(-0.5 * (dx * dx + dy * dy))
    ok = sm & ~jnp.isnan(vals)
    w = w * ok[None, :]
    v = jnp.where(ok, vals, 0.0)
    w_sum = w.sum(axis=1)
    out = (w @ v) / jnp.where(w_sum == 0, 1.0, w_sum)
    return jnp.where((w_sum == 0) | ~m0, jnp.nan, out)


def gaussian_2d_smooth_tiled(x0, y0, x, y, l_x, l_y, vals, mesh=None,
                             axis_name="experts", halo_factor=6.0):
    """Halo-exchange tiled smoother: each device owns a 1-D strip of output
    experts plus the sources within `halo_factor * l_x` of its strip — no
    replicated source set, no collectives (halos are assembled host-side
    where the tables live, matching per-host HDF5 ingestion at multi-host
    scale). Compute and memory are E/n_dev x (E/n_dev + halo) per device
    versus the all-gathered E/n_dev x E of `gaussian_2d_smooth_sharded`.

    Truncation: sources beyond halo_factor sigma carry weight
    < exp(-halo_factor^2/2) (~1.5e-8 at 6 sigma) — below the 1e-6 golden
    regression tolerance the reference's all-pairs smoother is held to
    (reference: GPSat/postprocessing.py:22, tests/integration.py:108-136).
    """
    import jax as _jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from gpsat_tpu.parallel.mesh import get_mesh

    if mesh is None:
        mesh = get_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    x0 = np.asarray(x0, dtype=np.float64)
    y0 = np.asarray(y0, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    vals = np.asarray(vals, dtype=np.float64)
    E_out = len(x0)
    if n_dev == 1 or E_out < 2 * n_dev:
        return gaussian_2d_smooth(x0, y0, x, y, l_x, l_y, vals)

    # strips: quantile split of outputs along x (balanced counts)
    order = np.argsort(x0, kind="stable")
    strips = np.array_split(order, n_dev)
    R = float(halo_factor) * float(l_x)

    src_idx = []
    for s in strips:
        lo, hi = x0[s].min() - R, x0[s].max() + R
        src_idx.append(np.where((x >= lo) & (x <= hi))[0])
    S_max = max(max(len(si) for si in src_idx), 1)
    Eo_max = max(len(s) for s in strips)

    def padded(getter, idx_lists, width, fill=0.0):
        out = np.full((n_dev, width), fill)
        for d, idx in enumerate(idx_lists):
            out[d, :len(idx)] = getter(idx)
        return out

    x0p = padded(lambda i: x0[i], strips, Eo_max)
    y0p = padded(lambda i: y0[i], strips, Eo_max)
    m0p = np.zeros((n_dev, Eo_max), dtype=bool)
    for d, s in enumerate(strips):
        m0p[d, :len(s)] = True
    xp = padded(lambda i: x[i], src_idx, S_max)
    yp = padded(lambda i: y[i], src_idx, S_max)
    vp = padded(lambda i: vals[i], src_idx, S_max, fill=np.nan)
    smp = np.zeros((n_dev, S_max), dtype=bool)
    for d, si in enumerate(src_idx):
        smp[d, :len(si)] = True

    shard = NamedSharding(mesh, P(axis_name))
    args = [_jax.device_put(jnp.asarray(a), shard)
            for a in (x0p, y0p, m0p, xp, yp, smp, vp)]
    lx = jnp.asarray(float(l_x))
    ly = jnp.asarray(float(l_y))

    @_jax.jit
    def run(x0p, y0p, m0p, xp, yp, smp, vp, lx, ly):
        def tile_fn(x0t, y0t, m0t, xt, yt, smt, vt, lx, ly):
            return _gaussian_2d_smooth_masked_jit(
                x0t[0], y0t[0], m0t[0], xt[0], yt[0], smt[0], lx, ly,
                vt[0])[None]

        spec = P(axis_name)
        return shard_map(
            tile_fn, mesh=mesh,
            in_specs=(spec,) * 7 + (P(), P()),
            out_specs=spec)(x0p, y0p, m0p, xp, yp, smp, vp, lx, ly)

    out_tiles = np.asarray(run(*args, lx, ly))
    out = np.full(E_out, np.nan)
    for d, s in enumerate(strips):
        out[s] = out_tiles[d, :len(s)]
    return out


@dataclass
class SmoothingConfig:
    """Per-hyperparameter smoothing settings (reference: postprocessing.py:55)."""
    l_x: Union[int, float] = 1
    l_y: Union[int, float] = 1
    max: Union[int, float, list, None] = None
    min: Union[int, float, list, None] = None

    def __getitem__(self, item):
        if hasattr(self, item):
            return getattr(self, item)
        raise AttributeError(f"{item} is not an attribute of SmoothingConfig")

    def get(self, key, default=None):
        return getattr(self, key, default)


_NON_PARAM_TABLES = ("preds", "run_details", "expert_locs", "oi_config")


def _resolve_component_limit(limit, row, dim_cols):
    """min/max may be a per-component list (e.g. per lengthscale dim)."""
    if isinstance(limit, (list, np.ndarray)) and len(limit) > 0:
        comp = int(row[dim_cols[-1]]) if dim_cols else 0
        return limit[min(comp, len(limit) - 1)]
    return limit


def smooth_hyperparameters(result_file: str,
                           params_to_smooth: List[str],
                           smooth_config_dict: Dict[str, dict],
                           xy_dims: List[str] = ("x", "y"),
                           reference_table_suffix: str = "",
                           table_suffix: str = "_SMOOTHED",
                           output_file: str = None,
                           model_name: str = None,
                           save_config_file: bool = True,
                           method: str = "auto"):
    """Smooth hyperparameter fields and write `*{table_suffix}` tables
    (reference: postprocessing.py:96).

    Per parameter and per unique slice of the non-(x, y) dimensions the field
    is clamped to [min, max] and Gaussian-smoothed with lengthscales
    (l_x, l_y). Unsmoothed parameter tables are copied under the new suffix.
    Optionally writes a follow-up prediction config (optimise=False,
    load_params pointing at the smoothed tables).
    """
    xy_dims = list(xy_dims)
    smooth_config_dict = {
        k: (v if isinstance(v, SmoothingConfig) else SmoothingConfig(**v))
        for k, v in smooth_config_dict.items()}

    suffixed = [f"{p}{reference_table_suffix}" for p in params_to_smooth]
    dfs, oi_configs = get_results_from_h5file(
        result_file, merge_on_expert_locations=False,
        select_tables=None, table_suffix=reference_table_suffix)
    assert oi_configs, f"no oi_config found in {result_file}"
    coords_col = oi_configs[-1]["data"]["coords_col"]

    # candidate parameter tables = stored tables that are not bookkeeping
    def _is_param_table(name):
        base = re.sub(f"{re.escape(reference_table_suffix)}$", "", name) \
            if reference_table_suffix else name
        return not any(base == t or base.startswith(t) for t in _NON_PARAM_TABLES)

    param_tables = [k for k in dfs if _is_param_table(k)]
    other_params = [k for k in param_tables if k not in suffixed]

    out = {}
    out_cfgs = {}
    for hp_with_suffix, hp in zip(suffixed, params_to_smooth):
        assert hp_with_suffix in dfs, \
            f"parameter {hp_with_suffix} not found in {list(dfs)}"
        cfg = smooth_config_dict.get(hp_with_suffix,
                                     smooth_config_dict.get(hp))
        assert cfg is not None, f"no smoothing config for {hp}"
        df = dfs[hp_with_suffix].copy(True)
        df_org_cols = df.columns.values.tolist()

        other_dims = [c for c in coords_col if c not in xy_dims]
        dim_cols = [c for c in df.columns if re.search(r"^_dim_\d", c)]
        other_dims = other_dims + dim_cols
        unique_odims = df[other_dims].drop_duplicates() if other_dims \
            else pd.DataFrame({"_all_": [0]})

        smooth_list = []
        for _, row in unique_odims.iterrows():
            if other_dims:
                row_df = row.to_frame().T.merge(df, on=other_dims, how="inner")
            else:
                row_df = df.copy()
            x0 = row_df[xy_dims[0]].values.astype(float)
            y0 = row_df[xy_dims[1]].values.astype(float)
            vals = row_df[hp].values.astype(float).copy()

            _min = _resolve_component_limit(cfg.get("min"), row, dim_cols)
            _max = _resolve_component_limit(cfg.get("max"), row, dim_cols)
            if _max is not None:
                vals[vals > _max] = _max
            if _min is not None:
                vals[vals < _min] = _min

            use_tiled = method == "tiled" or (
                method == "auto" and len(jax.devices()) > 1
                and len(x0) >= 4096)
            if use_tiled:
                # multi-device: strip-sharded with host-side halos
                smoothed = gaussian_2d_smooth_tiled(
                    x0, y0, x0, y0, cfg["l_x"], cfg["l_y"], vals)
            else:
                smoothed = gaussian_2d_smooth(x0, y0, x0, y0, cfg["l_x"],
                                              cfg["l_y"], vals)
            if _min is not None:
                smoothed = np.maximum(smoothed, _min)
            if _max is not None:
                smoothed = np.minimum(smoothed, _max)
            row_df[hp] = smoothed

            tmp = row_df[[hp] + xy_dims].copy(True).dropna()
            for od in other_dims:
                tmp[od] = row[od]
            tmp = tmp[df_org_cols]
            smooth_list.append(tmp)

        smooth_df = pd.concat(smooth_list)
        smooth_df = smooth_df.set_index(coords_col)
        out_table = f"{hp_with_suffix}{table_suffix}"
        cprint(f"adding smoothed table: {out_table}", c="OKCYAN")
        out[out_table] = smooth_df
        out_cfgs[out_table] = {"l_x": cfg["l_x"], "l_y": cfg["l_y"],
                               "min": cfg.get("min"), "max": cfg.get("max")}

    for param in other_params:
        out_table = f"{param}{table_suffix}"
        cprint(f"copying table: {param} to {out_table}", c="OKCYAN")
        cp = dfs[param].copy(True)
        out[out_table] = cp.set_index(coords_col)
        out_cfgs[out_table] = {"comment": f"no smoothing, copied from {param}"}

    output_file = result_file if output_file is None else output_file
    with ResultsStore(output_file, mode="a") as store:
        for k, v in out.items():
            store.put(k, v, attrs={"smooth_config": out_cfgs.get(k, {})})

    if save_config_file:
        out_config = re.sub(r"\.h5$",
                            f"{reference_table_suffix}{table_suffix}.json",
                            result_file)
        tmp = []
        for oic in oi_configs:
            oic = dict(oic)
            run_kwargs = dict(oic.get("run_kwargs", {}))
            run_kwargs["optimise"] = False
            run_kwargs["table_suffix"] = f"{reference_table_suffix}{table_suffix}"
            run_kwargs["store_path"] = output_file
            model = dict(oic.get("model", {}))
            model["load_params"] = {
                "file": output_file,
                "table_suffix": f"{reference_table_suffix}{table_suffix}"}
            oic["run_kwargs"] = run_kwargs
            oic["model"] = model
            tmp.append(json_serializable(oic))
        cprint(f"writing follow-up prediction config to: {out_config}", "OKBLUE")
        with open(out_config, "w") as f:
            json.dump(tmp, f, indent=4)
        return out_config


# ---------------------------------------------------------------------------
# prediction gluing (reference: postprocessing.py:462,533)
# ---------------------------------------------------------------------------

def _glue(preds_df, expert_locs_df, sigma, dims, R=3):
    from scipy.stats import norm
    preds = preds_df.copy(True)
    if isinstance(sigma, (int, float)):
        sigma = [sigma] * len(dims)
    if "f*_std" not in preds:
        loc = preds.columns.get_loc("f*_var") + 1
        preds.insert(loc, "f*_std", np.sqrt(preds["f*_var"]))
    total_w = np.ones(len(preds))
    for i, dcol in enumerate(dims):
        h = np.diff(np.sort(expert_locs_df[dcol].unique())).min()
        total_w = total_w * norm.pdf(preds[f"pred_loc_{dcol}"], preds[dcol],
                                     h / sigma[i])
    preds["total_weights"] = total_w
    keys = [f"pred_loc_{d}" for d in dims]
    preds["f*"] = preds["f*"] * total_w
    preds["f*_std"] = preds["f*_std"] * total_w
    glued = preds[keys + ["total_weights", "f*", "f*_std"]] \
        .groupby(keys).sum().reset_index()
    glued["f*"] = glued["f*"] / glued["total_weights"]
    glued["f*_std"] = glued["f*_std"] / glued["total_weights"]
    return glued.drop("total_weights", axis=1)


def glue_local_predictions_1d(preds_df, expert_locs_df, R=3):
    """Gaussian-weight blend of overlapping 1-d expert predictions
    (reference: postprocessing.py:462)."""
    return _glue(preds_df, expert_locs_df, sigma=R, dims=["x"])


def glue_local_predictions_2d(preds_df, expert_locs_df, R=3):
    """Gaussian-weight blend of overlapping 2-d expert predictions
    (reference: postprocessing.py:533)."""
    return _glue(preds_df, expert_locs_df, sigma=R, dims=["x", "y"])


# ---------------------------------------------------------------------------
# CLI (reference: postprocessing.py:616)
# ---------------------------------------------------------------------------

def main():
    config = get_config_from_sysargv()
    if config is None:
        print("usage: python -m gpsat_tpu.postprocessing <config.json>")
        return
    smooth_hyperparameters(**config)


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# sharded smoothing: experts distributed over the device mesh
# ---------------------------------------------------------------------------

def gaussian_2d_smooth_sharded(x0, y0, x, y, l_x, l_y, vals, mesh=None,
                               axis_name="experts"):
    """Multi-device Gaussian smoother: output experts sharded over the mesh,
    source points all-gathered over ICI.

    The reference's smoother is a single-host O(E^2) loop
    (postprocessing.py:22, numba target='parallel'); here each device computes
    its shard of output rows against the full (all-gathered) source set —
    the communication is one all_gather of [E] coordinate/value vectors over
    the interconnect, compute is E/n_dev x E per device.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from gpsat_tpu.parallel.mesh import get_mesh, pad_to_multiple

    if mesh is None:
        mesh = get_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    if n_dev == 1:
        return gaussian_2d_smooth(x0, y0, x, y, l_x, l_y, vals)

    E_out = len(x0)
    E_pad = pad_to_multiple(E_out, n_dev)

    def pad(a, fill=0.0):
        a = np.asarray(a, dtype=np.float64)
        return np.concatenate([a, np.full(E_pad - len(a), fill)])

    x0p, y0p = pad(x0), pad(y0)
    xs = jnp.asarray(np.asarray(x, dtype=np.float64))
    ys = jnp.asarray(np.asarray(y, dtype=np.float64))
    vs = jnp.asarray(np.asarray(vals, dtype=np.float64))

    shard = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    x0d = jax.device_put(jnp.asarray(x0p), shard)
    y0d = jax.device_put(jnp.asarray(y0p), shard)
    xs, ys, vs = (jax.device_put(a, rep) for a in (xs, ys, vs))
    lx = jnp.asarray(float(l_x))
    ly = jnp.asarray(float(l_y))

    @jax.jit
    def run(x0d, y0d, xs, ys, vs, lx, ly):
        def shard_fn(x0_blk, y0_blk, xs, ys, vs, lx, ly):
            # x0_blk: this device's output rows; xs/ys/vs replicated
            return _gaussian_2d_smooth_jit(x0_blk, y0_blk, xs, ys, lx, ly, vs)

        return shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P(), P(), P(), P(), P()),
            out_specs=P(axis_name))(x0d, y0d, xs, ys, vs, lx, ly)

    out = np.asarray(run(x0d, y0d, xs, ys, vs, lx, ly))
    return out[:E_out]
