"""Plot predictions/hyperparameters from a results store
(reference: examples/plot_from_results.py)."""
import matplotlib
matplotlib.use("Agg")

from gpsat_tpu import get_parent_path
from gpsat_tpu.local_experts import get_results_from_h5file
from gpsat_tpu.plot_utils import plot_hyper_parameters
from gpsat_tpu.utils import get_config_from_sysargv, cprint


def main():
    config = get_config_from_sysargv() or {}
    result_file = config.get("result_file",
                             get_parent_path("results", "inline_example.h5"))
    dfs, oi_config = get_results_from_h5file(result_file)
    coords_col = oi_config[0]["data"]["coords_col"] if oi_config else ["x", "y", "t"]
    fig = plot_hyper_parameters(
        dfs, coords_col=coords_col,
        table_names=config.get("table_names",
                               ["lengthscales", "kernel_variance",
                                "likelihood_variance"]),
        table_suffix=config.get("table_suffix", ""),
        suptitle=config.get("suptitle", "hyper parameters"))
    out = config.get("output", get_parent_path("results", "results_plot.png"))
    if fig is not None:
        fig.savefig(out, dpi=100)
        cprint(f"saved plot to {out}", "OKGREEN")


if __name__ == "__main__":
    main()
