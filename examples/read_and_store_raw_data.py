"""Raw-file sweep CLI wrapper (reference: examples/read_and_store_raw_data.py)."""
from gpsat_tpu.read_and_store import main

if __name__ == "__main__":
    main()
