"""Config-driven OI CLI: python -m examples.local_expert_oi <config.json>
(reference: examples/local_expert_oi.py:34-60). Falls back to
configs/example_local_expert_oi.json. Accepts a single config dict or a list
of configs (e.g. the follow-up file written by smooth_hyperparameters)."""

from gpsat_tpu import get_config_path
from gpsat_tpu.config_dataclasses import ExperimentConfig
from gpsat_tpu.utils import get_config_from_sysargv, cprint


def main():
    config = get_config_from_sysargv()
    if config is None:
        fallback = get_config_path("example_local_expert_oi.json")
        cprint(f"no config provided, using example: {fallback}", "WARNING")
        cfg_list = [ExperimentConfig.from_json_file(fallback)]
    elif isinstance(config, list):
        cfg_list = [ExperimentConfig.from_dict(c) for c in config]
    else:
        cfg_list = [ExperimentConfig.from_dict(config)]
    for cfg in cfg_list:
        cfg.run()


if __name__ == "__main__":
    main()
