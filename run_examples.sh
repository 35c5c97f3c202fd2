#!/bin/bash
# End-to-end CLI acceptance pipeline (reference: run_examples.sh):
# generate data -> read_and_store -> plot obs -> bin -> OI -> postprocess ->
# re-run OI with smoothed params -> plot results.
set -e
cd "$(dirname "$0")"

echo "=== 1/7 generate synthetic example data"
python -m examples.generate_example_data

echo "=== 2/7 read_and_store raw files"
python -m gpsat_tpu.read_and_store configs/example_read_and_store_raw_data.json

echo "=== 3/7 plot observations"
python -m examples.plot_observations configs/example_plot_observations.json || true

echo "=== 4/7 bin raw data"
python -m gpsat_tpu.bin_data configs/example_bin_raw_data.json

echo "=== 5/7 local expert OI"
python -m examples.local_expert_oi configs/example_local_expert_oi.json

echo "=== 6/7 postprocess (smooth hyperparameters) + re-predict"
python -m gpsat_tpu.postprocessing configs/example_postprocessing.json
python -m examples.local_expert_oi results/example_oi_SMOOTHED.json

echo "=== 7/7 plot results"
python -m examples.plot_from_results configs/example_plot_from_results.json || true

echo "ALL EXAMPLES COMPLETED"
