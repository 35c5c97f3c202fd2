"""Plot raw/binned observations from a store
(reference: examples/plot_observations.py)."""
import matplotlib
matplotlib.use("Agg")

from gpsat_tpu import get_parent_path
from gpsat_tpu.dataloader import DataLoader
from gpsat_tpu.plot_utils import plot_wrapper
from gpsat_tpu.utils import get_config_from_sysargv, cprint


def main():
    config = get_config_from_sysargv() or {}
    load_kwargs = config.get("input", config)
    df = DataLoader.load(**load_kwargs)
    val_col = config.get("val_col", "z")
    fig, stats = plot_wrapper(df, val_col=val_col,
                              max_obs=config.get("max_obs", 500_000))
    out = config.get("output", get_parent_path("results", "observations.png"))
    fig.savefig(out, dpi=100)
    cprint(f"saved plot to {out}", "OKGREEN")
    print(stats)


if __name__ == "__main__":
    main()
