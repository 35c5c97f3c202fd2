"""Binning CLI wrapper (reference: examples/bin_data.py)."""
from gpsat_tpu.bin_data import main

if __name__ == "__main__":
    main()
